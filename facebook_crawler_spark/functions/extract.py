"""Field-extraction expression library (SURVEY.md §2.6, F1-F16).

Every per-row Python parse in the reference compiles here to a built-in
Catalyst expression — regexp_extract / coalesce / from_json / higher-order
array functions — so extraction runs inside whole-stage codegen with zero
Python. Each function cites the reference behavior it reproduces.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def regex_search_between(col: Column, first: str, second: str) -> Column:
    """Greedy single-group extract between two literal markers, NULL when
    absent (reference utils/regex_search.py:4-8)."""
    pat = re.escape(first) + "(.*)" + re.escape(second)
    return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))


def regex_search_between_lazy(col: Column, first: str, second: str) -> Column:
    """Non-greedy variant: first occurrence of `first…second`, shortest
    match. The greedy reference form over-matches on whole-page HTML (it
    runs to the LAST occurrence of `second`); real field extraction wants
    the nearest close marker."""
    pat = re.escape(first) + "(.*?)" + re.escape(second)
    return F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))


def shortest_match_between(col: Column, first: str, second: str, max_len: int = 255) -> Column:
    """Non-greedy findall → shortest candidate, rejected if longer than
    `max_len` (reference utils/regex_search.py:11-19, T3)."""
    pat = re.escape(first) + "(.*?)" + re.escape(second)
    cands = F.regexp_extract_all(col, F.lit(pat), F.lit(1))
    shortest = F.array_min(F.transform(cands, lambda c: F.struct(F.length(c).alias("l"), c.alias("v"))))
    return F.when(shortest["l"] <= max_len, shortest["v"])


def coalesce_cascade(col: Column, marker_pairs: list[tuple[str, str]], max_len: int = 255) -> Column:
    """The 10-pattern title fallback chain (reference parsers/base_parser.py:24-46)
    as one `coalesce` of shortest-match extracts (F3)."""
    return F.coalesce(*[shortest_match_between(col, a, b, max_len) for a, b in marker_pairs])


TITLE_MARKERS = [
    ('"marketplace_listing_title":"', '"'),
    ('"custom_title":"', '"'),
    ('"listing_title":"', '"'),
    ('<title>', "</title>"),
]


def title_of(html: Column) -> Column:
    return coalesce_cascade(html, TITLE_MARKERS)


def seller_of(html: Column) -> Column:
    """First actor's (id, __typename) from the embedded `"actors":[...]`
    JSON (reference parsers/base_parser.py:48-56, F4). Returns a struct."""
    actors_json = F.regexp_extract(html, r'"actors":(\[.*?\])', 1)
    parsed = F.from_json(actors_json, "array<struct<id:string,__typename:string>>")
    # F.get (not [0]): empty actor arrays must yield NULL, not an ANSI
    # INVALID_ARRAY_INDEX throw
    first = F.get(parsed, 0)
    return F.struct(
        first["id"].alias("sellerId"), first["__typename"].alias("sellerType")
    )


def image_links_of(html: Column) -> Column:
    """`"listing_photos":[...]` → array of image URIs via from_json +
    transform (reference parsers/base_parser.py:58-64, F5)."""
    photos_json = F.regexp_extract(html, r'"listing_photos":(\[.*?\])', 1)
    parsed = F.from_json(photos_json, "array<struct<image:struct<uri:string>>>")
    return F.transform(parsed, lambda p: p["image"]["uri"])


def clean_quoted(col: Column) -> Column:
    """Strip quotes, lowercase, NULL out literal 'null'
    (reference parsers/base_parser.py:66-69, F6)."""
    return F.nullif(F.lower(F.regexp_replace(col, '"', "")), F.lit("null"))


def is_boosted_of(html: Column) -> Column:
    return clean_quoted(F.nullif(F.regexp_extract(html, r'"is_boosted":([^,}]+)', 1), F.lit("")))


def pdp_fields_of(html: Column) -> Column:
    """Nested pdp sections → flat map<icon_name, display_label>
    (reference parsers/property_parser.py:50-61, F7)."""
    sections_json = F.regexp_extract(html, r'"pdp_display_sections":(\[.*?\]\}\])', 1)
    parsed = F.from_json(
        sections_json,
        "array<struct<pdp_fields:array<struct<icon_name:string,display_label:string>>>>",
    )
    entries = F.flatten(F.transform(parsed, lambda s: s["pdp_fields"]))
    return F.map_from_entries(
        F.transform(entries, lambda e: F.struct(e["icon_name"], e["display_label"]))
    )


def description_of(html: Column) -> Column:
    """Redacted-description extract (reference parsers/property_parser.py:63-66)."""
    return regex_search_between_lazy(html, '"redacted_description":{"text":"', '"')


def split_part_trim(col: Column, delim: str, idx: int) -> Column:
    """split + element_at + trim (reference parsers/property_parser.py:92-101,
    scroll_parser.py:48-51; F8/F13). NULL-safe on short arrays."""
    arr = F.split(col, re.escape(delim))
    return F.when(F.size(arr) >= idx, F.trim(F.element_at(arr, idx)))


def relative_date(col: Column, round_ts: Column) -> Column:
    """'N days/weeks/months ago'-style text → timestamp, units 1/7/30 days,
    defaulting N=1 (reference parsers/property_parser.py:13-48, F9)."""
    n = F.coalesce(F.nullif(F.regexp_extract(col, r"(\d+)", 1), F.lit("")).cast("int"), F.lit(1))
    unit_days = (
        F.when(F.lower(col).contains("week"), F.lit(7))
        .when(F.lower(col).contains("month"), F.lit(30))
        .otherwise(F.lit(1))
    )
    return F.timestamp_seconds(F.unix_timestamp(round_ts) - (n * unit_days).cast("long") * 86400)


def epoch_to_ts(col: Column) -> Column:
    """Epoch seconds → timestamp (reference parsers/automotive_parser.py:9-12, F10)."""
    return F.timestamp_seconds(col.cast("long"))


AUTOMOTIVE_FIELDS = {
    "make": ('"vehicle_make_display_name":"', '"'),
    "model": ('"vehicle_model_display_name":"', '"'),
    "mileage": ('"vehicle_odometer_data":{"value":', ","),
    "fuelType": ('"vehicle_fuel_type":"', '"'),
    "condition": ('"vehicle_condition":"', '"'),
    "bodyColor": ('"vehicle_exterior_color":"', '"'),
    "interiorColor": ('"vehicle_interior_color":"', '"'),
    "transmissionType": ('"vehicle_transmission_type":"', '"'),
}


def automotive_fields(html: Column) -> list[Column]:
    """The 10 automotive extracts as one select-list (reference
    parsers/automotive_parser.py:14-63, F11): each a between-markers
    extract + F6-style cleanup; hp additionally digs into JSON."""
    cols = [
        clean_quoted(regex_search_between_lazy(html, a, b)).alias(name)
        for name, (a, b) in AUTOMOTIVE_FIELDS.items()
    ]
    hp_json = F.regexp_extract(html, r'"vehicle_power":(\{[^}]*\})', 1)
    cols.append(F.get_json_object(hp_json, "$.value").alias("hp"))
    return cols


def start_url(city_code: Column, category: Column, price_comb: Column) -> Column:
    """f-string URL construction (reference crawlers/scroll_crawler.py:72-75, F14)."""
    return F.format_string(
        "https://www.facebook.com/marketplace/%s/%s%s", city_code, category, price_comb
    )


def price_band(comb: Column) -> tuple[Column, Column]:
    """'?maxPrice=X&minPrice=Y' → (min, max) ints (reference
    crawlers/scroll_crawler.py:93-96, F15)."""
    max_p = F.regexp_extract(comb, r"maxPrice=(\d+)", 1).cast("int")
    min_p = F.regexp_extract(comb, r"minPrice=(\d+)", 1).cast("int")
    return min_p, max_p


def date_walk_back(date_col: Column, k: int) -> Column:
    """date - k days (reference data_processing/data_processor.py:56-57, F16)."""
    return F.date_sub(F.to_date(date_col), k)


def url_state(final_url: Column) -> Column:
    """'alive' | 'blocked' | 'gone' from the post-redirect URL (reference
    crawlers/details_crawler.py:63,75 and availability_crawler.py:85-106, P4)."""
    has_login = final_url.contains("login")
    has_next = final_url.contains("next")
    return (
        F.when(has_login & has_next, F.lit("blocked"))
        .when(has_login | has_next, F.lit("gone"))
        .otherwise(F.lit("alive"))
    )


def is_sold(title: Column) -> Column:
    """Sold/Rented predicate (reference crawlers/availability_crawler.py:25-40,
    parsers/property_parser.py:68-71, P5)."""
    return title.contains("Sold") | title.contains("Rented")
