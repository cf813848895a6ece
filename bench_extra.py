"""Round-6 optimization measurement harness (bench.py is FROZEN — this is
the guide §1.4 noop-sink isolation tool, not the driver's bench).

Usage:
  python bench_extra.py [query ...]          # time queries via noop sink
  PLAN_DIR=plans/r06 PLAN_TAG=before python bench_extra.py --plans [query ...]
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py ...

Each query is timed with `df.write.format("noop").mode("overwrite").save()`
(computes every column of every row, no sink cost) AND with the frozen
bench's `.count()` methodology, labeled via setJobDescription. Repeats via
REPEATS (default 2); reports all samples.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("REPEATS", "2"))
PLAN_DIR = os.environ.get("PLAN_DIR", "plans/r06")
PLAN_TAG = os.environ.get("PLAN_TAG", "before")

DEFAULT_QUERIES = [
    "delta_anti_join", "dedup_last_wins", "per_key_max", "grouped_metrics",
    "budget_rank", "month_rollup", "url_canonicalize", "exact_dedup_docs",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "cosine_topk", "lang_id",
    "text_stats",
]


def _spark():
    from facebook_crawler_spark.session import get_spark

    return get_spark(
        app_name="fcs-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )


def main() -> None:
    import __spark_entry__ as entry

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plans = "--plans" in sys.argv
    names = args or DEFAULT_QUERIES
    spark = _spark()
    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        if do_plans:
            os.makedirs(PLAN_DIR, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{PLAN_DIR}/{name}_{PLAN_TAG}.txt", "w") as fh:
                fh.write(plan)
            print(f"  {name}: plan -> {PLAN_DIR}/{name}_{PLAN_TAG}.txt", file=sys.stderr)
        noop, cnt = [], []
        for r in range(REPEATS):
            sc.setJobDescription(f"{name} noop r{r}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noop.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(f"{name} count r{r}")
            t0 = time.perf_counter()
            n = qs[name](spark, SF_DIR).count()
            cnt.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"noop": noop, "count": cnt, "rows": n}
        print(f"  {name}: noop={noop} count={cnt} rows={n}", file=sys.stderr)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "results": out}))


if __name__ == "__main__":
    main()
