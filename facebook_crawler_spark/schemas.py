"""Engine schemas (SURVEY.md §1.2).

The reference declares record shapes via pydantic with all-string scalars
(reference schemas/base_schemas.py:6-31); the engine uses typed StructTypes.
The payload table shape is fixed by BASELINE.json `input_hint`.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# North-rule payload table (BASELINE.json input_hint):
# images(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
#        caption:string, phash:int64)
# ---------------------------------------------------------------------------
IMAGES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

# Frontier: the engine's work queue, replacing the reference's Redis lists of
# remaining cities/prices/urls (reference db/redis_db.py:14-20,
# crawlers/scroll_crawler.py:30-35).
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canonical_url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("image_id", StringType(), False),
        StructField("host", StringType(), False),
        StructField("host_salt", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("seed_rank", LongType(), False),
        StructField("discovered_round", IntegerType(), False),
    ]
)

# Politeness / robots dimension, replacing the reference's proxy + sleep-pool
# constants (reference config.py:81-103) and per-proxy ban counters
# (reference crawlers/availability_crawler.py:16-17).
HOSTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("token_rate", IntegerType(), False),
        StructField("robots_delay_ms", IntegerType(), False),
        StructField("robots_disallow", ArrayType(StringType()), False),
        StructField("ban_threshold", IntegerType(), False),
        StructField("salt_factor", IntegerType(), False),
    ]
)

# Fetched payloads: one row per successfully fetched frontier URL.
FETCHED = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("canonical_url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("image_id", StringType(), False),
        StructField("fetch_round", IntegerType(), False),
        StructField("fetch_seq", LongType(), False),
        StructField("status", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
        # per-row verification verdict (input_hint invariants: decoded-pixel
        # PSNR/exactness + byte-exact caption + phash), computed in-round
        StructField("verified", BooleanType(), True),
    ]
)

# Per-round, per-partition lineage + metrics, replacing Redis checkpoints
# (reference crawlers/details_crawler.py:90-91) and Slack counts
# (reference utils/aleritna.py:7-25).
ROUND_LEDGER = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("scheduled", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("errors", LongType(), False),
        StructField("hosts_touched", LongType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)

# Listing record for the snapshot set-algebra stage — typed analog of the
# reference's BaseRecord (reference schemas/base_schemas.py:6-23): strings
# stay strings where the reference keeps raw page text (price), timestamps
# become TimestampType, imageLinks becomes array<string>.
LISTING = StructType(
    [
        StructField("adId", StringType(), False),
        StructField("url", StringType(), True),
        StructField("price", StringType(), True),
        StructField("city", StringType(), True),
        StructField("cantonCode", StringType(), True),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("imageLinks", ArrayType(StringType()), True),
        StructField("crawlDatetime", TimestampType(), True),
        StructField("last_check", TimestampType(), True),
        StructField("sellerId", StringType(), True),
        StructField("sellerType", StringType(), True),
        StructField("isBoosted", StringType(), True),
        StructField("file_seq", IntegerType(), True),
    ]
)


def _extend(base: StructType, extra: list[StructField]) -> StructType:
    return StructType(list(base.fields) + extra)


# Category record extensions — typed analogs of the reference's pydantic
# subclasses. Scalars stay strings where the reference keeps raw page text.
#
# AutomotiveRecord (reference schemas/automotive_schemas.py:4-17):
AUTOMOTIVE_RECORD = _extend(
    LISTING,
    [
        StructField("type", StringType(), True),  # constant 'automotive'
        StructField("vehicleType", StringType(), True),  # constant 'vehicle'
        StructField("condition", StringType(), True),
        StructField("conditionType", StringType(), True),
        StructField("originalCategoryId", StringType(), True),
        StructField("mileage", StringType(), True),
        StructField("make", StringType(), True),
        StructField("model", StringType(), True),
        StructField("hp", StringType(), True),
        StructField("fuelType", StringType(), True),
        StructField("bodyColor", StringType(), True),
        StructField("interiorColor", StringType(), True),
        StructField("transmissionType", StringType(), True),
    ],
)

# PropertyRecord + ForRent/ForSale (reference schemas/property_schemas.py:4-21):
PROPERTY_RECORD = _extend(
    LISTING,
    [
        StructField("type", StringType(), True),  # constant 'property'
        StructField("saleType", StringType(), True),  # 'rent' | 'sale'
        StructField("originalCategoryId", StringType(), True),
        StructField("address", StringType(), True),
        StructField("propertyType", StringType(), True),
        StructField("livingSpace", StringType(), True),
        StructField("rooms", StringType(), True),
        StructField("bathrooms", StringType(), True),
        StructField("parking", StringType(), True),
    ],
)

# reference schemas/automotive_schemas.py:9 / property_schemas.py:8,14-21
AUTOMOTIVE_CATEGORY_ID = "807311116002614"
PROPERTY_RENT_CATEGORY_ID = "807311116002614"
PROPERTY_SALE_CATEGORY_ID = "821056594720130"
