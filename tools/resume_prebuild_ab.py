"""Isolation A/B for the cold-start bloom prebuild (SURVEY r4 open item).

Question: on a resumed crawl, does staging the whole-frontier discovery
bloom's rebuild in the engine pool (overlapping it with round 1's pending
rebuild + fetch) cut the first-round wall time vs building it inline at
the first discovery?

Protocol: build ONE golden workdir (seed + SETUP_ROUNDS committed rounds
with discovery on — a real seen set, real discovered children), then for
each rep copy it and time `CrawlEngine(...); eng.run(max_rounds=1)` with
prebuild_bloom on vs off, arms alternated back-to-back so both see the
same noise window. Payload verify/store are OFF and payloads are tiny
(dim_span=9) so the timed round is startup-scan dominated — the effect
under measurement. A CPU probe brackets each rep.

Run:  python tools/resume_prebuild_ab.py          (local[CPUS], ~5 min)
Knobs: AB_URLS, AB_IMAGES, AB_SETUP_ROUNDS, AB_REPS env vars.
Results recorded in SURVEY.md (round 5).
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
N_URLS = int(os.environ.get("AB_URLS", "600000"))
N_IMAGES = int(os.environ.get("AB_IMAGES", "120000"))
SETUP_ROUNDS = int(os.environ.get("AB_SETUP_ROUNDS", "3"))
REPS = int(os.environ.get("AB_REPS", "4"))
N_HOSTS = 200
TOKEN_RATE = 250


def cpu_probe() -> float:
    """~0.65 s on this box when clean; >1 s flags a noisy window."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i & 7
    return time.perf_counter() - t0


def main() -> None:
    from facebook_crawler_spark.session import get_spark
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

    spark = get_spark(
        app_name="fcs-resume-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    dcfg = DiscoveryConfig(
        n_images=N_IMAGES, n_hosts=N_HOSTS, hot_pct=10, hot_host=syn.HOT_HOST, max_out=2
    )
    images = syn.gen_images(spark, N_IMAGES, partitions=CPUS * 2, dim_span=9).cache()
    images.count()
    hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=TOKEN_RATE)
    seeds = syn.gen_frontier_seeds(
        spark, N_URLS, n_images=N_IMAGES, n_hosts=N_HOSTS, hot_share_pct=10
    )

    def mk(wd: str, prebuild: bool) -> CrawlEngine:
        return CrawlEngine(
            spark, wd, images, hosts, error_permille=0,
            discovery=dcfg, verify_payloads=False, store_payloads=False,
            prebuild_bloom=prebuild,
        )

    golden = tempfile.mkdtemp(prefix="fcs-resume-ab-gold-")
    out: dict = {
        "urls": N_URLS, "images": N_IMAGES, "setup_rounds": SETUP_ROUNDS,
        "reps": REPS, "arms": {"prebuild_on": [], "prebuild_off": []}, "probes": [],
    }
    try:
        eng = mk(golden, prebuild=True)
        eng.seed(seeds)
        for _ in range(SETUP_ROUNDS):
            eng.run_round()  # sync commits — the golden state is fully barriered

        for rep in range(REPS):
            # alternate arm order so neither systematically rides a warmer cache
            order = ("prebuild_on", "prebuild_off") if rep % 2 == 0 else ("prebuild_off", "prebuild_on")
            for arm in order:
                wd = tempfile.mkdtemp(prefix="fcs-resume-ab-wd-")
                shutil.rmtree(wd)
                shutil.copytree(golden, wd)
                try:
                    probe = cpu_probe()
                    t0 = time.perf_counter()
                    e = mk(wd, prebuild=(arm == "prebuild_on"))
                    stats = e.run(max_rounds=1)
                    dt = time.perf_counter() - t0
                    out["arms"][arm].append(round(dt, 3))
                    out["probes"].append(round(probe, 3))
                    assert stats and stats[0]["fetched"] > 0
                    print(f"  rep{rep} {arm}: {dt:.2f}s (probe {probe:.2f}s)", file=sys.stderr)
                finally:
                    shutil.rmtree(wd, ignore_errors=True)
        for arm, xs in out["arms"].items():
            out[f"{arm}_best"] = min(xs)
            out[f"{arm}_mean"] = round(sum(xs) / len(xs), 3)
    finally:
        shutil.rmtree(golden, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
