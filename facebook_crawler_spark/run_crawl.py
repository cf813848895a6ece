"""spark-submit entrypoint: seed a frontier and drive crawl rounds.

The north_rule deployment shape:

    spark-submit --py-files fcs.zip --driver-memory 16g -m ... \
        facebook_crawler_spark/run_crawl.py \
        --workdir /data/crawl1 --urls 1000000 --images 200000 \
        --hosts 200 --token-rate 1500 --rounds 100 --discovery

On a cluster, --master and executor settings come from spark-submit; in
local mode the session factory picks local[$SPARK_GRAFT_CPUS]. Resume:
re-running with the same --workdir continues from the committed ledger
(seeding is skipped when the frontier table already exists).

NOTE: pass --driver-memory to spark-submit explicitly. The session
factory's spark.driver.memory=8g only applies when the JVM is launched
lazily (plain `python`); under spark-submit the JVM already exists, the
builder setting is silently ignored, and the 1g default OOMs the Arrow
allocator at crawl scale (a warning below checks the live heap).

DRIVER-MEMORY SIZING for the discovery-dedup bloom: the maintained
whole-frontier bloom naturally sizes at 10 bits/frontier-key of PYTHON
driver memory (not JVM heap) — ~1.25 GB per 10^9 frontier URLs, ~3x that
transiently during a rebuild's OR fold + broadcast. CrawlEngine clamps it
at `bloom_driver_budget` (default 1 GiB); past ~10^9 keys the capped
filter degrades gracefully toward pass-through (more exact-check traffic,
never wrong answers), so raise the budget — and the box's memory — with
the frontier, or shard the filter, rather than assuming 10^10 keys fit
the default.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

try:  # spark-submit runs this file as a top-level script: sys.path[0] is
    # THIS package directory, not its parent, so the package itself is not
    # importable until the --py-files zip lands on sys.path (which happens
    # only after the SparkContext starts). Bootstrap the repo-root layout;
    # a shipped --py-files zip that already resolves the import skips this.
    import facebook_crawler_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="frontier crawl runner")
    p.add_argument("--workdir", required=True)
    p.add_argument("--urls", type=int, default=100_000)
    p.add_argument("--images", type=int, default=20_000)
    p.add_argument("--hosts", type=int, default=200)
    p.add_argument("--token-rate", type=int, default=1500)
    p.add_argument("--rounds", type=int, default=1000)
    p.add_argument("--error-permille", type=int, default=0)
    p.add_argument("--discovery", action="store_true")
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--no-store-payloads", action="store_true")
    p.add_argument("--dim-span", type=int, default=97)
    args = p.parse_args(argv)

    from facebook_crawler_spark.session import get_spark
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

    spark = get_spark(app_name="fcs-crawl")
    heap = int(spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory())
    if heap < 4 << 30:
        print(
            f"WARNING: driver JVM heap is {heap / (1 << 30):.1f} GiB — under "
            "spark-submit the session factory's spark.driver.memory is "
            "ignored; pass --driver-memory 16g (Arrow buffers OOM a 1g "
            "driver at crawl scale)",
            file=sys.stderr,
        )
    images = syn.gen_images(spark, args.images, dim_span=args.dim_span).cache()
    hosts = syn.gen_hosts(spark, args.hosts, token_rate=args.token_rate)
    disc = (
        DiscoveryConfig(n_images=args.images, n_hosts=args.hosts, hot_pct=40, hot_host=syn.HOT_HOST)
        if args.discovery
        else None
    )
    eng = CrawlEngine(
        spark,
        args.workdir,
        images,
        hosts,
        error_permille=args.error_permille,
        verify_payloads=not args.no_verify,
        store_payloads=not args.no_store_payloads,
        discovery=disc,
    )
    if not eng.frontier.exists():
        seeds = syn.gen_frontier_seeds(spark, args.urls, n_images=args.images, n_hosts=args.hosts)
        eng.seed(seeds)
        print(f"seeded {args.urls} urls", file=sys.stderr)
    else:
        print(f"resuming from round {eng.committed_round()}", file=sys.stderr)

    t0 = time.perf_counter()
    stats = eng.run(max_rounds=args.rounds)
    dt = time.perf_counter() - t0
    total = sum(s["scheduled"] for s in stats)
    print(
        json.dumps(
            {
                "rounds": len(stats),
                "scheduled": total,
                "fetched": sum(s["fetched"] for s in stats),
                "discovered": sum(s.get("discovered", 0) for s in stats),
                "sec": round(dt, 2),
                "urls_per_sec": round(total / dt, 1) if dt > 0 else 0.0,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
