"""Isolation A/B for the schedule-pruned images scan (VERDICT r4 item 1).

Question: with the images table on disk and images ≫ schedule, does the
per-round fetch cost track |schedule| (pruned scan) instead of |images|
(full scan)?

Protocol: one bucketed on-disk images table (fat payloads, dim_span=97 —
scan cost must be visible); identical engines except `images_n_buckets`
(0 = read the same parquet unpruned, N = pruned). For each config run the
first ROUNDS politeness-bounded rounds at several token rates and report
the mean per-round fetch_commit phase plus the pruning stats. Payload
verify/store are OFF so the phase is scan+join dominated.

Run:  python tools/fetch_prune_ab.py          (local[CPUS], ~10 min)
Knobs: AB_IMAGES, AB_URLS, AB_BUCKETS, AB_ROUNDS, AB_RATES env vars.
Results recorded in PLANS.md (round 5).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("AB_IMAGES", "240000"))
N_URLS = int(os.environ.get("AB_URLS", "120000"))
N_BUCKETS = int(os.environ.get("AB_BUCKETS", "1024"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))
RATES = [int(x) for x in os.environ.get("AB_RATES", "1,5,25").split(",")]
N_HOSTS = 200


def main() -> None:
    from facebook_crawler_spark.session import get_spark
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.sources.layout import (
        read_bucketed_images,
        write_bucketed_images,
    )
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine

    spark = get_spark(
        app_name="fcs-prune-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    img_dir = tempfile.mkdtemp(prefix="fcs-prune-ab-img-")
    out: dict = {"images": N_IMAGES, "buckets": N_BUCKETS, "rounds": ROUNDS, "cfg": {}}
    try:
        t0 = time.perf_counter()
        write_bucketed_images(
            syn.gen_images(spark, N_IMAGES, partitions=CPUS * 2, dim_span=97),
            img_dir,
            N_BUCKETS,
        )
        print(f"layout write: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        disk = read_bucketed_images(spark, img_dir)

        for rate in RATES:
            hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=rate)
            seeds = syn.gen_frontier_seeds(
                spark, N_URLS, n_images=N_IMAGES, n_hosts=N_HOSTS, hot_share_pct=10
            )
            for label, nb in (("full", 0), ("pruned", N_BUCKETS)):
                wd = tempfile.mkdtemp(prefix="fcs-prune-ab-wd-")
                try:
                    eng = CrawlEngine(
                        spark, wd, disk, hosts, error_permille=0,
                        images_n_buckets=nb, verify_payloads=False,
                        store_payloads=False,
                    )
                    eng.seed(seeds)
                    fetch_s, sched = [], 0
                    for _ in range(ROUNDS):
                        s = eng.run_round()
                        fetch_s.append(s["timings"].get("fetch_commit", 0.0))
                        sched += s["scheduled"]
                    key = f"rate{rate}_{label}"
                    out["cfg"][key] = {
                        "sched_per_round": sched // ROUNDS,
                        "fetch_commit_mean_s": round(sum(fetch_s) / len(fetch_s), 3),
                        "fetch_commit_s": [round(x, 3) for x in fetch_s],
                    }
                    print(f"  {key}: {out['cfg'][key]}", file=sys.stderr)
                finally:
                    shutil.rmtree(wd, ignore_errors=True)
    finally:
        shutil.rmtree(img_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
