"""Scan-parallelism repair for underpartitioned inputs.

A parquet scan can never produce more tasks than row groups (a split only
yields the row groups whose midpoint lands in it), so a table written as one
file with one row group — common for small-to-mid dimension/dataset drops —
caps every downstream map-side stage at ONE task no matter how many cores
the cluster has. For pipelines whose cost is per-row compute *before* the
first exchange (shingling, hashing, regex extraction, vector arithmetic)
that turns an embarrassingly parallel stage into a single-core bottleneck:
measured on the 50k-doc benchmark table (1 row group, 15 MB), the MinHash
map stage ran 2 tasks on 32 cores — 31 s of a 47 s query.

`spread` is the scale-adaptive repair (optimization guide §2: derive
partitioning from the data, don't tune constants): when the plan's scan
yields fewer partitions than the cluster's parallelism, round-robin
repartition to the core count — a few-MB shuffle that buys an N-way map
stage. When the input is already well-split (the 100-TB case: thousands of
row groups), it is a NO-OP and adds no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition `df` to `target` (default: defaultParallelism) iff its
    current plan yields fewer partitions than that — otherwise return it
    unchanged. Row-preserving and deterministic (round-robin repartition
    sorts before redistributing), so results are identical either way.

    Exchange-bearing inputs are returned untouched: their parallelism is
    already set by the shuffle (spark.sql.shuffle.partitions + AQE), and
    probing them via `.rdd` would eagerly execute the adaptive plan's query
    stages at plan-build time. The intended call site is a scan-side
    projection, where `.rdd.getNumPartitions()` is a pure planning call."""
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
