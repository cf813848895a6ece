"""Batch sources & sinks (SURVEY.md §2.1 S1-S8).

The reference stores one gzipped-JSONL file per (category, stage, date) on
S3 under Hive-style `year=/month=/day=/[city=]` prefixes (reference
db/s3_db.py:12-36, utils/base_service.py:22-48). Spark natively reads and
writes exactly that layout; these helpers pin the engine's conventions:

- S1/S2: JSONL(.gz) read/write with explicit schema (never inferSchema in
  production paths — a schema scan of 100 TB is a job of its own);
- S3: Hive partition columns (year, month, day[, city]) derived from a
  date column — partition pruning then reaches every date-filtered scan;
- S4: multi-path scan is one `read.json([...])` — never a driver loop;
- S5/ST6: latest-available-partition ≤ T-1 with a bounded walk-back,
  resolved from partition METADATA (directory listing), not data;
- S8: staging cleanup by dropping whole partition directories.
"""

from __future__ import annotations

import os
import shutil
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_stage(df: DataFrame, root: str, day: date, per_city: bool = False, codec: str = "gzip") -> str:
    """S2/S3: write a stage dataset as JSONL.gz under year=/month=/day=/."""
    out = df.withColumn("year", F.lit(day.year)).withColumn("month", F.lit(day.month)).withColumn(
        "day", F.lit(day.day)
    )
    parts = ["year", "month", "day"] + (["city"] if per_city else [])
    (
        out.write.mode("overwrite")
        # dynamic: replace only the partitions present in `out`, not the
        # whole root — static overwrite would wipe every other day
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*parts)
        .option("compression", codec)
        .json(root)
    )
    return _day_path(root, day)


def _day_path(root: str, day: date) -> str:
    return os.path.join(root, f"year={day.year}", f"month={day.month}", f"day={day.day}")


def read_stage(spark: SparkSession, root: str, schema: StructType | str, day: date | None = None) -> DataFrame:
    """S1/S4: scan the dataset (all days, pruned by Catalyst when the
    caller filters) or exactly one day (partition-path read)."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    if day is None:
        return reader.option("basePath", root).json(root)
    return reader.json(_day_path(root, day))


def latest_available_day(root: str, before: date, max_back: int = 5) -> date | None:
    """S5/ST6: the most recent day ≤ `before` with data, walking back at
    most `max_back` days (reference data_processor.py:52-71, tolerance
    config.py:92-93). Resolved from the partition directory listing —
    O(max_back) stat calls, no data read."""
    for k in range(max_back + 1):
        d = before - timedelta(days=k)
        if os.path.isdir(_day_path(root, d)) and any(
            f.endswith((".json", ".json.gz")) for f in os.listdir(_day_path(root, d))
        ):
            return d
    return None


def read_latest_snapshot(
    spark: SparkSession, root: str, schema: StructType | str, before: date, max_back: int = 5
) -> tuple[DataFrame, date] | None:
    d = latest_available_day(root, before, max_back)
    if d is None:
        return None
    return read_stage(spark, root, schema, day=d), d


def drop_stage_day(root: str, day: date) -> None:
    """S8: drop one day's staging data (intermediate GC, reference
    data_processor.py:137-140). Whole-directory drop — the partition layout
    makes GC a metadata operation."""
    shutil.rmtree(_day_path(root, day), ignore_errors=True)


def observe_counts(df: DataFrame, name: str) -> DataFrame:
    """A1 metrics channel: attach row-count observation evaluated during
    the action that materializes `df` — zero extra jobs, unlike the
    reference's len() over driver lists (reference utils/aleritna.py:7-25).
    Read back via spark listener or `Observation`."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))
