"""URL canonicalization + hashing (SURVEY.md F12; north_star).

The reference canonicalizes by chopping everything after "/?" and prefixing
the site origin (reference parsers/scroll_parser.py:29-33). The engine
generalizes: lowercase scheme+host, drop fragment, strip tracking params,
sort the remaining query params, hash with xxhash64.

Two equivalent implementations, tested to agree:

- ``canonicalize_url_expr`` — pure Catalyst expressions (JVM-side,
  whole-stage-codegen'd). Used wherever SQL-parity matters.
- ``canonicalize_urls`` — vectorized Arrow/pandas UDF, as BASELINE.json's
  north_star specifies for the frontier path (batch string ops, no per-row
  Python loops over characters).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Tracking parameters stripped during canonicalization.
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "mc_cid", "mc_eid", "ref", "igshid")

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|mc_cid|mc_eid|ref|igshid)="


def canonicalize_url_expr(url: Column) -> Column:
    """Catalyst-expression canonicalizer.

    Stays inside whole-stage codegen: regexp extracts + higher-order array
    functions, no UDF.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    scheme = F.when(scheme == "", F.lit("https")).otherwise(scheme)
    # scheme part optional so scheme-less input ('h.test/p') canonicalizes
    # like the Arrow-UDF path (first segment = host), not to 'https:///'
    host = F.lower(F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]*)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    sorted_query = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_query)),
    )


def _canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonicalizer body (north_star's frontier-path UDF).

    Vectorized pandas string ops over the whole Arrow batch; the only
    per-element Python is the final param sort, on already-split lists.
    """
    ext = urls.str.extract(r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?")
    scheme = ext[0].fillna("https").str.lower()
    host = ext[1].str.lower().str.replace(r":(80|443)$", "", regex=True)
    path = ext[2].where(ext[2] != "", "/")
    query = ext[3].fillna("")

    def _sort_query(q: str) -> str:
        if not q:
            return ""
        parts = [p for p in q.split("&") if p and not _is_tracking(p)]
        return "&".join(sorted(parts))

    sorted_q = query.map(_sort_query)
    return scheme + "://" + host + path + sorted_q.where(sorted_q == "", "?" + sorted_q)


def _is_tracking(param: str) -> bool:
    key = param.split("=", 1)[0]
    return key.startswith(TRACKING_PREFIXES) or key in TRACKING_EXACT


_canonicalize_udf = None


def canonicalize_urls(url: Column) -> Column:
    """Apply the Arrow-batched canonicalizer to a column.

    Built lazily: pandas_udf return-type parsing needs an active
    SparkSession, so the decorator can't run at import time.
    """
    global _canonicalize_udf
    if _canonicalize_udf is None:
        _canonicalize_udf = pandas_udf(_canonicalize_batch, "string")
    return _canonicalize_udf(url)


def url_hash(canonical: Column) -> Column:
    """64-bit stable hash of the canonical URL (generic bucketing key,
    JVM-side)."""
    return F.xxhash64(canonical)


def fnv64_signed(s: str) -> int:
    """FNV-1a 64-bit of a string as SIGNED int64 — the frontier's url_hash
    in `mode="fnv"` (sim-parity mode: FNV-1a is 6 lines in any language, so
    an external oracle can replay every hash-derived decision trivially).
    Cost: ~1µs per URL inside the Arrow batch — fine at test scale, but at
    a 10^10-URL frontier that is hours of pure Python, which is why the
    production default is the JVM xxhash64 path below."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 64) if h >= (1 << 63) else h


_fnv_udf = None


def frontier_url_hash(canonical: Column, mode: str = "xxhash64") -> Column:
    """url_hash of the canonical URL column.

    mode="xxhash64" (production default): `F.xxhash64` — JVM-side,
    whole-stage-codegen'd, zero Arrow round-trips at seed/discovery time.
    The crawl simulator replays it bit-for-bit with an independent
    pure-Python XXH64 (sim/oracle.py; parity asserted in tests/test_urls.py
    against Spark's own output, like the canonicalizer's expr/UDF pair).

    mode="fnv": Arrow-batched FNV-1a — explicit sim-parity mode for
    external oracles that want a 6-line hash.
    """
    if mode == "xxhash64":
        return F.xxhash64(canonical)
    if mode != "fnv":
        raise ValueError(f"unknown url-hash mode: {mode!r}")
    global _fnv_udf
    if _fnv_udf is None:

        def batch(s: pd.Series) -> pd.Series:
            return s.map(fnv64_signed).astype("int64")

        _fnv_udf = pandas_udf(batch, "long")
    return _fnv_udf(canonical)


def host_of(url: Column) -> Column:
    """Lowercased host of a URL (scheme optional), port stripped."""
    host = F.lower(F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]*)", 1))
    return F.regexp_replace(host, r":(80|443)$", "")


def path_of(url: Column) -> Column:
    """Path component ('' → '/'); scheme optional like host_of."""
    path = F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*([^?#]*)", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)
