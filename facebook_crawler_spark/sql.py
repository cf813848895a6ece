"""SQL-API surface: register the engine's tables as temp views so every
query a reference user runs is also expressible as `spark.sql(...)`.

The engine is DataFrame-first, but `spark.sql` over the same relations is
free — Catalyst compiles both to the same plans. `register_testdata`
mirrors the driver's DuckDB view set; `register_crawl` exposes a crawl
workdir's tables (frontier/fetched/host_state/round_ledger).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


def register_crawl(spark: SparkSession, workdir: str) -> None:
    from facebook_crawler_spark.sources.tables import Table

    for name in ("frontier", "fetched", "host_state", "round_ledger"):
        t = Table(os.path.join(workdir, name))
        if t.exists():
            t.read(spark).createOrReplaceTempView(name)
