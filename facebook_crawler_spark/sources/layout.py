"""Bucketed on-disk images layout — the Iceberg `bucket(N, image_id)`
partition-transform analog over plain parquet (SURVEY.md R1; the real
deployment writes `PARTITIONED BY (bucket(N, image_id))` through the
Iceberg catalog and this module disappears).

Why it exists: the crawl engine's synthetic fetch is `frontier ⋈ images`
(north_rule — the stand-in for the reference crawler fetching ONLY its
scheduled URLs, reference crawlers/details_crawler.py:57-61). Without a
pruned layout every politeness-bounded round streams the ENTIRE images
scan through the join — O(|images|) I/O per round at 10^10 images, the
last per-round full-table touch in the loop. With this layout the engine
pushes the round's schedule into the scan as

- a `p_bucket IN (...)` partition filter (directory-level file skipping:
  pmod(xxhash64(image_id), N) of every scheduled id, collected driver-side
  — bounded by N, not by the schedule), and
- an `image_id BETWEEN lo AND hi` range predicate (parquet row-group
  min/max skipping inside the surviving buckets — files are written sorted
  by image_id for exactly this).

Pruning math, stated honestly: a schedule of s uniform-random ids touches
N·(1 − (1 − 1/N)^s) ≈ N·(1 − e^(−s/N)) buckets, so directory pruning pays
when s ≲ N and approaches pass-through when s ≫ N. N therefore sizes to
the DATA (Iceberg bucket counts in the thousands at 100 TB — bounded bytes
per bucket), and the steady-state politeness-bounded round (hosts ×
token_rate ≪ |images|) is exactly the s-small regime. The range predicate
adds row-group skipping for schedules that cluster in id space (late-crawl
residues, per-host id locality); for uniform schedules it is a no-op that
costs nothing. Either way bytes read shrink monotonically — the filters
can never change the join result because every scheduled id's bucket is,
by construction, in the IN-set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "p_bucket"


def bucket_expr(n_buckets: int, col: str = "image_id") -> Column:
    """Iceberg-style bucket id: pmod(xxhash64(id), N) — JVM-side, one
    codegen projection; the same expression derives the schedule's bucket
    set, so the two sides can never disagree."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def write_bucketed_images(df: DataFrame, path: str, n_buckets: int) -> None:
    """Write the images table partitioned by bucket(n_buckets, image_id),
    each file sorted by image_id (row-group min/max stats worth pruning
    on). One shuffle, once, at load time — the write-side cost that buys
    every crawl round its pruned scan."""
    (
        df.withColumn(BUCKET_COL, bucket_expr(n_buckets))
        .repartition(n_buckets, BUCKET_COL)
        .sortWithinPartitions("image_id")
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def read_bucketed_images(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucketed layout back; `p_bucket` comes back as a partition
    directory column, which is what lets Catalyst turn the engine's IN-set
    into PartitionFilters (file skipping at plan time, no I/O)."""
    return spark.read.parquet(path)
