"""Deterministic synthetic tables (FIXTURES.md; BASELINE.json input_hint).

Everything is generated *distributed*: `spark.range(n)` plus deterministic
column expressions / Arrow batches, never a driver-side list. The same code
that makes the 50k-row test table makes the 10^10-row bench frontier — only
`n` changes, and generation parallelism follows the range partitioning.

All randomness is a pure function of the row id and a fixed seed (xxhash64
mixes on the JVM side; numpy PCG64 keyed by row id inside Arrow batches), so
any row can be re-derived independently — this is what lets the fetch
verifier recompute expected pixels without storing them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from facebook_crawler_spark.functions import images as img

SEED = 42
HOT_HOST = "cdn.fb-images.test"

_VOCAB = (
    "alpine lake view vintage chalet renovated sunny quiet spacious balcony "
    "garden garage lift mountain city center station nearby bright modern "
    "charming cozy furnished parking cellar attic terrace südlage wohnung "
    "maison appartement «rare» 'privé' straße zürich genève léman piazza"
).split()


def _rand(col_id, salt: int):
    """Deterministic uniform int64 from (row id, salt) — JVM-side."""
    return F.abs(F.xxhash64(col_id, F.lit(SEED), F.lit(salt)))


# ---------------------------------------------------------------------------
# images — the north-rule payload table
# ---------------------------------------------------------------------------

def caption_for(index: int) -> str:
    """Seeded caption text, 5-40 words, unicode + embedded quotes."""
    n_words = 5 + (index * 2654435761) % 36
    words = [_VOCAB[(index * 31 + k * 7919) % len(_VOCAB)] for k in range(n_words)]
    return " ".join(words)


def image_row(index: int, dim_span: int = 97) -> tuple[bytes, int, int, str, str, int]:
    """Recompute the full payload for synthetic image #index (oracle path).

    `dim_span` bounds w,h to 32..32+dim_span-1 — the bench uses a small
    span so throughput measures scheduling+fetch, not raw disk bandwidth;
    tests use the default (payloads up to 128x128)."""
    w = 32 + (index * 2246822519) % dim_span
    h = 32 + (index * 3266489917) % dim_span
    fmt = "png" if (index * 668265263) % 10 < 7 else "jpeg"
    arr = img.pixels_for(index, w, h)
    buf = img.encode(arr, fmt)
    # Stamp the phash of the DECODED-AFTER-ENCODE pixels: the codec is
    # deterministic, so the fetch verifier can demand an exact match
    # (ham == 0) for every format — no calibrated lossy bound to falsify.
    # png decodes bit-identically, so only the lossy path pays a decode.
    ph = img.phash64(arr if fmt == "png" else img.decode(buf)[1])
    return buf, w, h, fmt, caption_for(index), ph


def gen_images(
    spark: SparkSession, n: int, partitions: int | None = None, dim_span: int = 97
) -> DataFrame:
    """The `images` payload table (image_id, bytes, w, h, fmt, caption, phash)."""
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [image_row(int(i), dim_span) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "image_id": [f"img_{int(i):012d}" for i in pdf["id"]],
                    "bytes": [r[0] for r in rows],
                    "w": pd.array([r[1] for r in rows], dtype="int32"),
                    "h": pd.array([r[2] for r in rows], dtype="int32"),
                    "fmt": [r[3] for r in rows],
                    "caption": [r[4] for r in rows],
                    "phash": pd.array([r[5] for r in rows], dtype="int64"),
                }
            )

    return base.mapInPandas(
        make,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


# ---------------------------------------------------------------------------
# frontier seeds — Zipf-ish host skew, tracking-param noise, dup URLs
# ---------------------------------------------------------------------------

def gen_frontier_seeds(
    spark: SparkSession,
    n: int,
    n_images: int,
    n_hosts: int = 200,
    hot_share_pct: int = 40,
    dup_pct: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Seed list: url, image_id, host, seed_rank, priority (FIXTURES.md §2).

    - hot host holds `hot_share_pct`% of URLs (the facebook-CDN skew analog);
    - ~`dup_pct`% of rows duplicate an earlier URL modulo tracking params and
      query order (canonicalization/dedup fixture);
    - seed_rank is a seeded permutation key (xxhash64 of the row id): a
      deterministic total order that plays the role of the reference's
      shuffled work list (reference crawlers/scroll_crawler.py:16-19, made
      reproducible per SURVEY.md R2). It is deliberately NOT a dense 0..n-1
      rank — computing one needs a global sort (single-partition window),
      which would serialize at 10^10 rows; any deterministic total order
      gives the same crawl-ordering semantics. Ties (birthday collisions)
      are broken by url_hash downstream.
    """
    base = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    is_dup = (_rand(F.col("id"), 1) % 100 < dup_pct) & (F.col("id") > 0)
    # dup rows point at an earlier row's payload; originals at themselves
    target = F.when(is_dup, _rand(F.col("id"), 2) % F.col("id")).otherwise(F.col("id"))

    host_draw = _rand(target, 3) % 100
    # mild Zipf tail over the cold hosts: square a uniform draw
    cold_idx = F.pow(( _rand(target, 4) % 1000) / 1000.0, F.lit(2.0)) * (n_hosts - 1)
    host = F.when(host_draw < hot_share_pct, F.lit(HOT_HOST)).otherwise(
        F.format_string("host-%03d.example.test", cold_idx.cast("int"))
    )
    image_id = F.format_string("img_%012d", target % n_images)

    # URL noise varies by *row* (not target) so dups differ superficially:
    # unsorted query params, tracking params, mixed-case host.
    mixed_host = F.when(_rand(F.col("id"), 5) % 7 == 0, F.upper(host)).otherwise(host)
    tracking = F.when(
        _rand(F.col("id"), 6) % 3 == 0, F.lit("&utm_source=feed&fbclid=XYZ")
    ).otherwise(F.lit(""))
    query = F.when(_rand(F.col("id"), 7) % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("?a=1&b=2"))
    url = F.concat(F.lit("https://"), mixed_host, F.lit("/item/"), image_id, query, tracking)

    return base.select(
        url.alias("url"),
        image_id.alias("image_id"),
        host.alias("host"),
        (_rand(F.col("id"), 8) % 5).cast("int").alias("priority"),
        _rand(F.col("id"), 9).alias("seed_rank"),
    )


# ---------------------------------------------------------------------------
# hosts — politeness/robots dimension (small; broadcast everywhere)
# ---------------------------------------------------------------------------

def gen_hosts(
    spark: SparkSession,
    n_hosts: int = 200,
    token_rate: int = 50,
    ban_threshold: int = 20,
    hot_salt_factor: int = 32,
) -> DataFrame:
    """Hosts dimension mirroring the reference politeness constants
    (token_rate=LISTINGS_NUM_PER_PROXY reference config.py:86-87,
    ban_threshold=PROXIES_BANNED_THRESHOLD reference config.py:95-96)."""
    base = spark.range(0, n_hosts, 1, 1)
    host = F.when(F.col("id") == 0, F.lit(HOT_HOST)).otherwise(
        F.format_string("host-%03d.example.test", F.col("id") - 1)
    )
    disallow = F.when(
        _rand(F.col("id"), 20) % 4 == 0, F.array(F.lit("/private"), F.lit("/admin"))
    ).when(_rand(F.col("id"), 20) % 4 == 1, F.array(F.lit("/tmp"))).otherwise(
        F.array().cast("array<string>")
    )
    return base.select(
        host.alias("host"),
        F.lit(token_rate).cast("int").alias("token_rate"),
        (500 + _rand(F.col("id"), 21) % 1001).cast("int").alias("robots_delay_ms"),
        disallow.alias("robots_disallow"),
        F.lit(ban_threshold).cast("int").alias("ban_threshold"),
        F.when(F.col("id") == 0, F.lit(hot_salt_factor)).otherwise(F.lit(1)).cast("int").alias("salt_factor"),
    )


# ---------------------------------------------------------------------------
# snapshot/scroll listing fixtures + cantons dimension (set-algebra stage)
# ---------------------------------------------------------------------------

_CANTONS = (
    "ZH BE LU UR SZ OW NW GL ZG FR SO BS BL SH AR AI SG GR AG TG TI VD VS NE GE JU"
).split()


def gen_cantons(spark: SparkSession, n_rows: int = 400) -> DataFrame:
    """Cantons dimension (reference new_codes.csv via data_processor.py:28-32)."""
    base = spark.range(0, n_rows, 1, 1)
    c = F.col("id") % len(_CANTONS)
    return base.select(
        F.format_string("%04d", 1000 + F.col("id")).alias("zip"),
        F.format_string("city-%03d", F.col("id")).alias("city"),
        F.element_at(F.array(*[F.lit(x) for x in _CANTONS]), (c + 1).cast("int")).alias("cantonCode"),
        (5.9 + (F.col("id") % 100) * 0.04).alias("west"),
        (45.8 + (F.col("id") % 100) * 0.02).alias("south"),
        (6.0 + (F.col("id") % 100) * 0.04).alias("north"),
        (45.9 + (F.col("id") % 100) * 0.02).alias("east"),
    )


def gen_listings(
    spark: SparkSession,
    n_snapshot: int = 20_000,
    n_scroll: int = 15_000,
    overlap_pct: int = 60,
    foreign_pct: int = 15,
    intra_dup_pct: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """(snapshot_t1, scroll_t0) fixture pair (FIXTURES.md §4).

    scroll rows overlap the snapshot ad-id space with probability
    `overlap_pct`; `intra_dup_pct` of scroll rows repeat an earlier scroll
    ad-id with a later file_seq (last-wins dedup fixture, reference
    data_processing/data_processor.py:44-50).
    """

    def listing_cols(key, file_seq):
        return [
            F.format_string("ad_%010d", key).alias("adId"),
            F.format_string("https://www.facebook.com/marketplace/item/%010d", key).alias("url"),
            F.format_string("CHF %d'%03d", 1 + _rand(key, 31) % 9, _rand(key, 32) % 1000).alias("price"),
            F.format_string("city-%03d", _rand(key, 33) % 400).alias("city"),
            F.when(
                _rand(key, 34) % 100 < foreign_pct, F.format_string("X%d", _rand(key, 35) % 9)
            ).otherwise(
                F.element_at(
                    F.array(*[F.lit(x) for x in _CANTONS]), (_rand(key, 36) % 26 + 1).cast("int")
                )
            ).alias("cantonCode"),
            F.when(_rand(key, 37) % 10 == 0, F.lit(None).cast("string"))
            .otherwise(F.format_string("listing %d", key))
            .alias("title"),
            F.format_string("desc %d", _rand(key, 38)).alias("description"),
            F.array_repeat(
                F.format_string("https://scontent.example/%d.jpg", key), (_rand(key, 39) % 6).cast("int")
            ).alias("imageLinks"),
            F.timestamp_seconds(F.lit(1700000000) + _rand(key, 40) % 86400).alias("crawlDatetime"),
            F.timestamp_seconds(F.lit(1700000000) - _rand(key, 41) % (30 * 86400)).alias("last_check"),
            F.format_string("seller_%06d", _rand(key, 42) % 5000).alias("sellerId"),
            F.when(_rand(key, 43) % 2 == 0, F.lit("User")).otherwise(F.lit("Page")).alias("sellerType"),
            F.when(_rand(key, 44) % 5 == 0, F.lit("true")).otherwise(F.lit("false")).alias("isBoosted"),
            file_seq.cast("int").alias("file_seq"),
        ]

    snap = spark.range(0, n_snapshot, 1, 8).select(*listing_cols(F.col("id"), F.lit(0)))

    sc = spark.range(0, n_scroll, 1, 8)
    is_dup = (_rand(F.col("id"), 50) % 100 < intra_dup_pct) & (F.col("id") > 0)
    base_row = F.when(is_dup, _rand(F.col("id"), 51) % F.col("id")).otherwise(F.col("id"))
    # overlap: map a scroll row into the snapshot key space with p=overlap_pct
    in_overlap = _rand(base_row, 52) % 100 < overlap_pct
    key = F.when(in_overlap, _rand(base_row, 53) % n_snapshot).otherwise(
        n_snapshot + base_row  # disjoint "new today" key space
    )
    scroll = sc.select(*listing_cols(key, (_rand(F.col("id"), 54) % 13)))
    return snap, scroll
