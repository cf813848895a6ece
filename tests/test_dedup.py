"""Dedup-family operators: exact, MinHash-LSH, Jaccard verify, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.operators import dedup as dd

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "The quick brown fox jumps over the lazy dog near the river bank today!"),  # near-dup of 1
    (3, "the QUICK brown fox jumps over the lazy dog near the river bank today"),  # exact-dup of 1 (normalized)
    (4, "Completely different content about alpine lakes and mountain chalets in winter"),
    (5, "Completely different content about alpine lakes and mountain chalets in summer"),  # near-dup of 4
    (6, "Short text"),
    (7, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_exact_dedup(docs):
    out = dd.exact_dedup(docs, "doc_id", "text")
    kept = {r.doc_id for r in out.collect()}
    # 3 collapses into 1 (case/punct-insensitive); 2 differs only by '!' which
    # normalization strips → also collapses into 1
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert {4, 5, 6, 7} <= kept


def test_minhash_lsh_finds_near_dups(docs):
    cands = dd.minhash_lsh_candidates(docs, "doc_id", "text", n_hashes=16, bands=8)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (1, 2) in pairs or (1, 3) in pairs  # identical shingle sets always collide
    verified = dd.verify_near_dups(cands, docs, "doc_id", "text", threshold=0.6)
    vpairs = {(r.id_a, r.id_b) for r in verified.collect()}
    assert (1, 2) in vpairs and (1, 3) in vpairs and (2, 3) in vpairs
    assert (4, 5) in vpairs
    assert all(a < b for a, b in vpairs)
    # no cross-content false positives survive verification
    assert not any({a, b} & {1, 2, 3} and {a, b} & {4, 5} for a, b in vpairs)


def test_jaccard_expression(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], ["x", "y"])
    val = df.select(dd.jaccard(F.col("x"), F.col("y")).alias("j")).first().j
    assert abs(val - 0.5) < 1e-9


def test_simhash_near_dups(docs):
    out = dd.simhash_near_dups(docs, "doc_id", "text", max_hamming=10)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 3) in pairs  # same tokens modulo case → identical simhash
    hams = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    assert hams[(1, 3)] == 0


def test_simhash_deterministic(docs):
    a = {(r.id, r.simhash) for r in dd.simhash_codes(docs, "doc_id", "text").collect()}
    b = {(r.id, r.simhash) for r in dd.simhash_codes(docs, "doc_id", "text").collect()}
    assert a == b


def test_bucket_width_guardrail(spark):
    # 300 identical docs → one giant bucket → guardrail drops it
    df = spark.createDataFrame([(i, "same text everywhere") for i in range(300)], ["doc_id", "text"])
    cands = dd.minhash_lsh_candidates(df, "doc_id", "text")
    assert cands.count() == 0  # bucket wider than max_bucket → dropped, no O(n^2) blowup


def test_minhash_xxh_family_finds_exact_dups(spark):
    """hash_family="xxh" (production JVM xxhash64) runs the same plan shape;
    identical-content docs must land in the same buckets under any minwise
    family, so every exact-dup pair found by md5 is found by xxh too."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i % 7}") for i in range(40)]
        + [(100, ""), (101, None)],
        "doc_id long, text string",
    )
    md5_pairs = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    xxh_pairs = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            docs, "doc_id", "text", hash_family="xxh"
        ).collect()
    }
    # identical texts (same i % 7) share full shingle sets → same signature
    exact_dups = {
        (a, b) for a in range(40) for b in range(a + 1, 40) if a % 7 == b % 7
    }
    assert exact_dups <= md5_pairs
    assert exact_dups <= xxh_pairs
    # empty/NULL docs take the sentinel path: they may pair with each other
    # (identical sentinel signatures, same as the md5 family) but must
    # never pair with a content doc
    assert not any((a > 99) != (b > 99) for a, b in xxh_pairs)
    # md5u (universal-permutation production family, the gate family):
    # same invariants, plus exact parity with its closed-form definition
    md5u_pairs = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(
            docs, "doc_id", "text", hash_family="md5u"
        ).collect()
    }
    assert exact_dups <= md5u_pairs
    assert not any((a > 99) != (b > 99) for a, b in md5u_pairs)


def test_md5u_hash_matches_closed_form(spark):
    """g_k = (a_k·(int(md5(s)[:12],16) mod p) + b_k) mod p — the exact
    formula the generated DuckDB oracle replays
    (('0x'||substr(md5(x),1,12))::BIGINT and the same (a,b,p) literals)."""
    import hashlib

    from facebook_crawler_spark.operators.dedup import _MH_A, _MH_B, _MH_P, _hash_fn

    vals = ["quick brown fox", "a", "ümlaut straße", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {
        r.s: [r[f"h{k}"] for k in range(3)]
        for r in df.select(
            "s", *[_hash_fn(F.col("s"), k, "md5u").alias(f"h{k}") for k in range(3)]
        ).collect()
    }
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:12], 16)
        assert got[v] == [
            (_MH_A[k] * (h % _MH_P) + _MH_B[k]) % _MH_P for k in range(3)
        ], v
