"""The composed daily crawl pipeline — the reference's main.py:11-43 as one
declarative plan set:

    scroll dedup + canton filter        reference data_processor.py:75-98
    delta / overlap / missing           reference data_processor.py:100-135
    to_check / not_to_check split       reference data_processor.py:100-118
    detail pagination of the delta      reference crawlers/details_crawler.py:25-110
    typed record assembly               reference parsers/automotive_parser.py:14-63,
                                        parsers/property_parser.py:68-110
    availability re-check of to_check   reference crawlers/availability_crawler.py:43-148
    snapshot merge                      reference data_processor.py:137-150

The page fetch is injected (`fetch_detail` / `fetch_recheck` callables that
attach an `html` — and for re-check a `final_url` — column): in production
that is the frontier engine's fetched table; in tests and gates it is the
deterministic html_fixture generator, so every downstream value has a
closed-form oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from facebook_crawler_spark import schemas
from facebook_crawler_spark.functions.extract import (
    automotive_fields,
    description_of,
    image_links_of,
    is_boosted_of,
    is_sold,
    pdp_fields_of,
    seller_of,
    split_part_trim,
    title_of,
    url_state,
)
from facebook_crawler_spark.operators.setalgebra import (
    dedup_last_wins,
    delta,
    filter_member,
    merge_snapshot,
    missing,
    overlap,
    topk_split,
)

RENTED_MARKER = 'dir="auto">Rented</span>'

# columns re-parsed from the page; everything else passes through from the
# scroll record (reference parsers/base_parser.py parse_item overwrite set)
_REPARSED = {"title", "description", "imageLinks", "isBoosted", "sellerId", "sellerType"}


def _passthrough(pages: DataFrame, html_col: str) -> list[str]:
    return [c for c in pages.columns if c not in _REPARSED and c not in (html_col, "final_url")]


def _base_parse(pages: DataFrame, html_col: str) -> list:
    h = F.col(html_col)
    s = seller_of(h)
    return [
        title_of(h).alias("title"),
        description_of(h).alias("description"),
        image_links_of(h).alias("imageLinks"),
        is_boosted_of(h).alias("isBoosted"),
        s["sellerId"].alias("sellerId"),
        s["sellerType"].alias("sellerType"),
    ]


def assemble_automotive(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Delta pages → AUTOMOTIVE_RECORD rows (reference
    parsers/automotive_parser.py:14-63): base parse + the 10 vehicle
    extracts + the pydantic constants."""
    h = F.col(html_col)
    return pages.select(
        *_passthrough(pages, html_col),
        *_base_parse(pages, html_col),
        F.lit("automotive").alias("type"),
        F.lit("vehicle").alias("vehicleType"),
        F.lit(None).cast("string").alias("conditionType"),
        F.lit(schemas.AUTOMOTIVE_CATEGORY_ID).alias("originalCategoryId"),
        *automotive_fields(h),
    )


def assemble_property(pages: DataFrame, sale_type: str = "rent", html_col: str = "html") -> DataFrame:
    """Delta pages → PROPERTY_RECORD rows (reference
    parsers/property_parser.py:68-110): Rented pages are dropped entirely,
    then base parse + pdp-derived rooms/bathrooms/propertyType/parking."""
    h = F.col(html_col)
    kept = pages.filter(~h.contains(RENTED_MARKER))  # property_parser.py:68-71
    m = pdp_fields_of(F.col(html_col))
    bb = F.element_at(m, "bedrooms-bathrooms")
    cat_id = (
        schemas.PROPERTY_RENT_CATEGORY_ID if sale_type == "rent" else schemas.PROPERTY_SALE_CATEGORY_ID
    )
    return kept.select(
        *_passthrough(pages, html_col),
        *_base_parse(kept, html_col),
        F.lit("property").alias("type"),
        F.lit(sale_type).alias("saleType"),
        F.lit(cat_id).alias("originalCategoryId"),
        F.lit(None).cast("string").alias("address"),
        F.lower(F.element_at(m, "building-city")).alias("propertyType"),
        F.lit(None).cast("string").alias("livingSpace"),
        split_part_trim(bb, "·", 1).alias("rooms"),
        split_part_trim(bb, "·", 2).alias("bathrooms"),
        F.lower(F.element_at(m, "car")).alias("parking"),
    )


def availability_recheck(
    pages: DataFrame, round_ts, html_col: str = "html", url_col: str = "final_url"
) -> DataFrame:
    """to_check pages → still-available listings: post-redirect URL must be
    alive (no login/next, reference availability_crawler.py:85-106) and the
    title must not be Sold (":25-40); survivors get last_check stamped."""
    alive = url_state(F.col(url_col)) == "alive"
    not_sold = ~F.coalesce(is_sold(title_of(F.col(html_col))), F.lit(False))
    out = pages.filter(alive & not_sold)
    if round_ts is not None:
        out = out.withColumn("last_check", F.lit(round_ts).cast("timestamp"))
    return out.drop(html_col, url_col)


def daily_snapshot(
    snapshot_t1: DataFrame,
    scroll_t0: DataFrame,
    cantons: DataFrame,
    fetch_detail: Callable[[DataFrame], DataFrame],
    fetch_recheck: Callable[[DataFrame], DataFrame],
    category: str = "propertyrentals",
    check_cap: int = 8000,
    round_ts=None,
) -> dict[str, DataFrame]:
    """The full day: returns every intermediate stage plus the merged
    snapshot_t0 (reference main.py:24-43 + data_processor.py:137-150)."""
    scroll = filter_member(dedup_last_wins(scroll_t0), cantons, "cantonCode")
    d = delta(scroll, snapshot_t1)
    ov = overlap(snapshot_t1, scroll)
    if round_ts is not None:
        ov = ov.withColumn("crawlDatetime", F.lit(round_ts).cast("timestamp"))
    miss = missing(snapshot_t1, scroll)
    to_check, not_to_check = topk_split(miss, "last_check", check_cap)

    detail_pages = fetch_detail(d)
    if category in ("vehicle", "cars"):
        parsed = assemble_automotive(detail_pages)
    else:
        parsed = assemble_property(
            detail_pages, "rent" if category == "propertyrentals" else "sale"
        )
    available = availability_recheck(fetch_recheck(to_check), round_ts)
    snap = merge_snapshot(parsed, available, ov, not_to_check)
    return {
        "scroll": scroll,
        "delta": d,
        "overlap": ov,
        "missing": miss,
        "to_check": to_check,
        "not_to_check": not_to_check,
        "parsed_delta": parsed,
        "available": available,
        "snapshot_t0": snap,
    }
