"""Canonicalizer invariants: expr and Arrow-UDF paths agree (SURVEY.md F12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_crawler_spark.functions.urls import (
    canonicalize_url_expr,
    canonicalize_urls,
    host_of,
    path_of,
    url_hash,
)

CASES = [
    ("https://CDN.FB-Images.Test/item/img_1?b=2&a=1&utm_source=x&fbclid=Z", "https://cdn.fb-images.test/item/img_1?a=1&b=2"),
    ("http://Host-001.Example.Test:80/a/b?z=9", "http://host-001.example.test/a/b?z=9"),
    ("https://h.test", "https://h.test/"),
    ("https://h.test/p?utm_campaign=x", "https://h.test/p"),
    ("https://h.test/p?ref=feed&x=1#frag", "https://h.test/p?x=1"),
    ("https://h.test:443/p", "https://h.test/p"),
    # scheme-less: first segment is the host on both the expr and UDF paths
    ("H.Test/p?b=2&a=1", "https://h.test/p?a=1&b=2"),
    ("h.test", "https://h.test/"),
]


def test_udf_matches_expr_on_golden_cases(spark):
    """Including the scheme-less cases the fixture generator never emits."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    out = df.select(
        canonicalize_url_expr(F.col("url")).alias("e"),
        canonicalize_urls(F.col("url")).alias("u"),
    ).collect()
    assert [(r.e, r.u) for r in out if r.e != r.u] == []


def test_simulator_fnv_matches_engine_fnv():
    """The oracle's independent FNV-1a re-implementation must equal the
    engine's for every frontier URL shape."""
    from facebook_crawler_spark.functions.urls import fnv64_signed
    from facebook_crawler_spark.sim.oracle import _fnv64_signed

    samples = [
        "https://cdn.fb-images.test/item/img_000000000042?disc=1",
        "https://host-199.example.test/item/img_000000000001",
        "", "ü¶é-unicode", "a" * 300,
    ]
    assert [fnv64_signed(s) for s in samples] == [_fnv64_signed(s) for s in samples]


def test_simulator_xxh64_matches_spark(spark):
    """The oracle's independent pure-Python XXH64 (seed 42) must equal
    Spark's F.xxhash64 — the production frontier hash — on every length
    class of the algorithm (empty, <4, <8, <32, 32-boundary, long) and on
    real frontier URL shapes."""
    from facebook_crawler_spark.sim.oracle import _xxh64_signed

    samples = [
        "", "a", "abc", "abcd", "abcdefg", "abcdefgh", "0123456789abcde",
        "0123456789abcdef", "x" * 31, "x" * 32, "x" * 33, "y" * 64, "z" * 100,
        "https://cdn.fb-images.test/item/img_000000000042?disc=1",
        "https://host-199.example.test/item/img_000000000001?disc=3",
        "ü¶é-unicode-ß", "a" * 300,
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    assert [got[s] for s in samples] == [_xxh64_signed(s) for s in samples]


def test_frontier_url_hash_modes(spark):
    """frontier_url_hash: xxhash64 mode is the JVM expression, fnv mode the
    Arrow UDF; both are process-stable and match their pure-Python twins."""
    from facebook_crawler_spark.functions.urls import fnv64_signed, frontier_url_hash
    from facebook_crawler_spark.sim.oracle import _xxh64_signed

    urls = [u for u, _ in CASES]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    rows = df.select(
        "u",
        frontier_url_hash(F.col("u")).alias("hx"),
        frontier_url_hash(F.col("u"), "fnv").alias("hf"),
    ).collect()
    for r in rows:
        assert r.hx == _xxh64_signed(r.u)
        assert r.hf == fnv64_signed(r.u)


def test_expr_canonicalization_golden(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r.c for r in df.select(canonicalize_url_expr(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_udf_matches_expr_on_fixture_urls(spark):
    from facebook_crawler_spark.sources import synthetic as syn

    seeds = syn.gen_frontier_seeds(spark, 5000, n_images=1000)
    df = seeds.select(
        canonicalize_url_expr(F.col("url")).alias("e"),
        canonicalize_urls(F.col("url")).alias("u"),
    )
    assert df.filter(F.col("e") != F.col("u")).count() == 0


def test_url_hash_and_parts(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    out = df.select(
        url_hash(canonicalize_url_expr(F.col("url"))).alias("h"),
        host_of(F.col("url")).alias("host"),
        path_of(F.col("url")).alias("path"),
    ).collect()
    # hash is injective on distinct canonical forms (cases 4 and 6 collide
    # by design: tracking-strip and port-strip reach the same canonical URL)
    assert len({r.h for r in out}) == len({want for _, want in CASES})
    assert out[0].host == "cdn.fb-images.test"
    assert out[2].path == "/"
