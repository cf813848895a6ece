"""HTML/page extraction as an Arrow-batched UDF (SURVEY.md F17, §2.7).

The reference parses pages row-at-a-time with BeautifulSoup + regex
cascades (reference parsers/scroll_parser.py:17-57, base_parser.py:24-69).
HTML parsing has no Spark-native function, so this is one of the engine's
few sanctioned UDF surfaces — vectorized pandas `.str` ops over the whole
Arrow batch (no per-row Python except the unavoidable findall fan-out).

`html_extract(df, html_col)` returns the flat struct of the reference's
BaseRecord parse fields; `parse_scroll_grid` is the UDTF-shaped variant
(many records per page, reference parsers/scroll_parser.py:12-61) built on
mapInPandas.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EXTRACT_SCHEMA = (
    "title string, sellerId string, sellerType string, imageLinks array<string>, "
    "isBoosted string, is_sold boolean"
)

_TITLE_PATTERNS = [
    r'"marketplace_listing_title":"(.*?)"',
    r'"custom_title":"(.*?)"',
    r'"listing_title":"(.*?)"',
    r"<title>(.*?)</title>",
]


def _extract_batch(pdf: pd.DataFrame, html_col: str) -> pd.DataFrame:
    h = pdf[html_col].fillna("")
    title = None
    for pat in _TITLE_PATTERNS:  # coalesce cascade (base_parser.py:24-46)
        cand = h.str.extract(pat, expand=False)
        title = cand if title is None else title.combine_first(cand)
    title = title.where(title.str.len() <= 255)

    seller_id = h.str.extract(r'"actors":\[\{"id":"(.*?)"', expand=False)
    seller_type = h.str.extract(r'"actors":\[\{[^}]*"__typename":"(.*?)"', expand=False)

    links = h.map(lambda s: re.findall(r'"uri":"(.*?)"', s) or None)

    boosted = (
        h.str.extract(r'"is_boosted":([^,}]+)', expand=False)
        .str.replace('"', "", regex=False)
        .str.lower()
    )
    boosted = boosted.where(boosted != "null")

    sold = h.str.contains("Sold") | h.str.contains('dir="auto">Rented</span>')

    return pd.DataFrame(
        {
            "title": title,
            "sellerId": seller_id,
            "sellerType": seller_type,
            "imageLinks": links,
            "isBoosted": boosted,
            "is_sold": sold,
        }
    )


def html_extract(df: DataFrame, html_col: str = "html", keep: list[str] | None = None) -> DataFrame:
    """Extract the BaseRecord parse fields from an HTML column, keeping
    `keep` passthrough columns (default: all non-HTML columns)."""
    keep = keep if keep is not None else [c for c in df.columns if c != html_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in keep
    )
    out_schema = (schema + ", " if schema else "") + EXTRACT_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            extracted = _extract_batch(pdf, html_col)
            yield pd.concat([pdf[keep].reset_index(drop=True), extracted], axis=1)

    return df.mapInPandas(run, out_schema)


def parse_scroll_grid(df: DataFrame, html_col: str = "html") -> DataFrame:
    """UDTF-shaped grid parse: many (adId, url, price, location) records per
    scroll page (reference parsers/scroll_parser.py:12-61). Records missing
    the href anchor are skipped, like the reference's guard clauses
    (scroll_parser.py:26-57)."""
    item_re = re.compile(
        r'<a href="(?P<href>/marketplace/item/(?P<adid>\d+)[^"]*)"[^>]*>(?:.*?)'
        r'<span class="price">(?P<price>.*?)</span>(?:.*?)'
        r'<span class="loc">(?P<loc>.*?)</span>',
        re.S,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"page_id": [], "adId": [], "url": [], "price": [], "city": [], "cantonCode": []}
            for pid, html in zip(pdf["page_id"], pdf[html_col].fillna("")):
                for m in item_re.finditer(html):
                    loc = m.group("loc")
                    parts = [p.strip() for p in loc.split(",")]
                    out["page_id"].append(pid)
                    out["adId"].append(m.group("adid"))
                    out["url"].append(
                        "https://www.facebook.com" + m.group("href").split("/?")[0]
                    )
                    out["price"].append(m.group("price"))
                    out["city"].append(parts[0] if parts else None)
                    out["cantonCode"].append(parts[1] if len(parts) > 1 else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, "page_id long, adId string, url string, price string, city string, cantonCode string"
    )
