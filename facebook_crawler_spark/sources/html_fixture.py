"""Deterministic HTML-page fixtures for the extraction-operator gates.

Every page is a pure function of `doc_id`, built with Catalyst expressions
(format_string / when / transform) so the same generator scales from the
500-row test table to any size without a driver loop. The driver's DuckDB
oracles do NOT re-parse these pages — they derive the expected extraction
output directly from the same doc_id arithmetic, which makes the gate an
independent two-implementation check (generator+extractor vs closed form).

The embedded markers reproduce the reference's page structure:
- title marker variants      reference parsers/base_parser.py:24-46
- "actors":[...] seller      reference parsers/base_parser.py:48-56
- "listing_photos":[...]     reference parsers/base_parser.py:58-64
- "is_boosted" variants      reference parsers/base_parser.py:66-69
- pdp_display_sections       reference parsers/property_parser.py:50-61
- vehicle_* automotive block reference parsers/automotive_parser.py:14-63
- "N units ago" date text    reference parsers/property_parser.py:13-48
- scroll grid items          reference parsers/scroll_parser.py:12-61
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FUELS = ["Diesel", "Petrol", "Electric", "Hybrid"]
CONDS = ["Excellent", "Good", "Fair"]
COLORS = ["Black", "White", "Silver", "Blue", "Red", "Grey"]
TRANS = ["Manual", "Automatic"]
UNITS = ["days", "weeks", "months"]
CATS = ["propertyrentals", "propertyforsale", "vehicles"]
PTYPES = ["Apartment", "House"]
PARKING = ["Garage", "Street", "None"]
CANTONS = (
    "ZH BE LU UR SZ OW NW GL ZG FR SO BS BL SH AR AI SG GR AG TG TI VD VS NE GE JU"
).split()

# fixed "crawl moment" for relative-date resolution (UTC)
ROUND_TS = "2023-11-15 00:00:00"
ROUND_EPOCH = 1_700_006_400


def _pick(lst: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in lst]), (idx + 1).cast("int"))


def title_text(d: Column) -> Column:
    """'Listing {d}' with a ' - Sold' suffix on every 7th page."""
    return F.concat(
        F.lit("Listing "),
        d.cast("string"),
        F.when(d % 7 == 0, F.lit(" - Sold")).otherwise(F.lit("")),
    )


def html_page(d: Column) -> Column:
    """One detail-page HTML string per doc_id, embedding every marker the
    extraction family (F3-F11, P4-P6) parses."""
    t = title_text(d)
    title_json = (
        F.when(d % 3 == 0, F.concat(F.lit('"marketplace_listing_title":"'), t, F.lit('"')))
        .when(d % 3 == 1, F.concat(F.lit('"custom_title":"'), t, F.lit('"')))
        .otherwise(F.lit('"no_title_marker":"y"'))
    )
    head_title = F.when(
        d % 3 == 2, F.concat(F.lit("<title>"), t, F.lit("</title>"))
    ).otherwise(F.lit(""))
    actors = F.when(d % 11 == 0, F.lit('"actors":[]')).otherwise(
        F.format_string(
            '"actors":[{"id":"seller_%d","__typename":"%s"}]',
            d % 500,
            F.when(d % 2 == 0, F.lit("User")).otherwise(F.lit("Page")),
        )
    )
    n_photos = (d % 4).cast("int")
    photos_body = F.when(
        n_photos >= 1,
        F.concat_ws(
            ",",
            F.transform(
                F.sequence(F.lit(1), n_photos),  # guarded: sequence(1,0) counts DOWN
                lambda j: F.format_string(
                    '{"image":{"uri":"https://scontent.example/%d_%d.jpg"}}', d, j
                ),
            ),
        ),
    ).otherwise(F.lit(""))
    photos = F.concat(F.lit('"listing_photos":['), photos_body, F.lit("]"))
    boosted = (
        F.when(d % 5 == 0, F.lit('"is_boosted":true'))
        .when(d % 5 == 1, F.lit('"is_boosted":false'))
        .when(d % 5 == 2, F.lit('"is_boosted":"null"'))
        .when(d % 5 == 3, F.lit('"is_boosted":"True"'))
        .otherwise(F.lit('"no_boost_marker":0'))
    )
    pdp = F.format_string(
        '"pdp_display_sections":[{"pdp_fields":['
        '{"icon_name":"bedrooms-bathrooms","display_label":"%d Beds · %d Baths"},'
        '{"icon_name":"building-city","display_label":"%s"},'
        '{"icon_name":"car","display_label":"%s"}]}]',
        d % 5 + 1,
        d % 3 + 1,
        _pick(PTYPES, d % 2),
        _pick(PARKING, d % 3),
    )
    desc = F.format_string('"redacted_description":{"text":"Desc %d"}', d)
    auto = F.format_string(
        '"vehicle_make_display_name":"Make%d","vehicle_model_display_name":"Model %d",'
        '"vehicle_odometer_data":{"value":%d,"unit":"KILOMETERS"},"vehicle_fuel_type":"%s",'
        '"vehicle_condition":"%s","vehicle_exterior_color":"%s","vehicle_interior_color":"%s",'
        '"vehicle_transmission_type":"%s","vehicle_power":{"value":"%d PS"}',
        d % 9,
        d % 17,
        (d * 37) % 200000,
        _pick(FUELS, d % 4),
        _pick(CONDS, d % 3),
        _pick(COLORS, d % 6),
        _pick(COLORS, (d + 1) % 6),
        _pick(TRANS, d % 2),
        d % 300 + 50,
    )
    date_span = F.format_string(
        '<span class="date">%d %s ago</span>', d % 11 + 1, _pick(UNITS, d % 3)
    )
    rented = F.when(d % 13 == 0, F.lit('<span dir="auto">Rented</span>')).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><head>"),
        head_title,
        F.lit("</head><body><script>{"),
        F.concat_ws(",", title_json, actors, photos, boosted, pdp, desc, auto),
        F.lit("}</script>"),
        date_span,
        rented,
        F.lit("</body></html>"),
    )


def final_url(d: Column) -> Column:
    """Post-redirect URL variants for the url_state predicate (P4):
    login+next → blocked, login|next → gone, else alive."""
    return (
        F.when(d % 4 == 0, F.format_string(
            "https://www.facebook.com/login/?next=%%2Fmarketplace%%2Fitem%%2F%d", d))
        .when(d % 4 == 1, F.lit("https://www.facebook.com/login"))
        .when(d % 4 == 2, F.format_string(
            "https://www.facebook.com/marketplace/item/%d?next=1", d))
        .otherwise(F.format_string("https://www.facebook.com/marketplace/item/%d", d))
    )


def price_comb(d: Column) -> Column:
    """'?maxPrice=X&minPrice=Y' combination string (F15 fixture,
    reference crawlers/scroll_crawler.py:93-96)."""
    return F.format_string("?maxPrice=%d&minPrice=%d", (d % 9 + 1) * 1000, (d % 9) * 500)


def grid_html(d: Column) -> Column:
    """Scroll-grid page with doc_id%4 items; item 1 loses its anchor on
    every 5th page (the parser's missing-href guard case, reference
    parsers/scroll_parser.py:26-57)."""
    def item(j: Column) -> Column:
        ad = d * 10 + j
        body = F.format_string(
            '<span class="price">CHF %d</span><span class="loc">city-%03d, %s</span>',
            (d + j * 100) % 1000,
            (d + j) % 50,
            _pick(CANTONS, (d + j) % 26),
        )
        anchored = F.concat(
            F.format_string('<a href="/marketplace/item/%d/?ref=rss" class="it"><img/>', ad),
            body,
            F.lit("</a>"),
        )
        plain = F.concat(F.lit('<div class="it"><img/>'), body, F.lit("</div>"))
        return F.when((d % 5 == 0) & (j == 1), plain).otherwise(anchored)

    k = (d % 4).cast("int")
    items = F.when(
        k >= 1, F.concat_ws("", F.transform(F.sequence(F.lit(1), k), item))
    ).otherwise(F.lit(""))
    return F.concat(F.lit("<html><body>"), items, F.lit("</body></html>"))


def pages_for_listings(df: DataFrame, ad_col: str = "adId") -> DataFrame:
    """Attach fixture html + final_url keyed by the numeric part of adId —
    the synthetic per-listing 'fetch' for the composed daily pipeline."""
    num = F.regexp_extract(F.col(ad_col), r"(\d+)", 1).cast("long")
    return df.withColumn("html", html_page(num)).withColumn("final_url", final_url(num))


def detail_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, html, final_url) fixture pages."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        html_page(F.col("doc_id")).alias("html"),
        final_url(F.col("doc_id")).alias("final_url"),
    )


def grid_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (page_id, html) scroll-grid fixture pages."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("page_id"), grid_html(F.col("doc_id")).alias("html")
    )
