"""Similarity search + text analysis operators over the driver testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.operators import similarity as sim
from facebook_crawler_spark.operators import text as tx


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_cosine_expression(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"])
    vals = [r.c for r in df.select(F.round(sim.cosine(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert vals == [1.0, 0.0]


def test_brute_force_topk_self_is_best(emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = sim.brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        best = min(rows, key=lambda r: r.rank)
        assert best.vec_id == qid and abs(best.cos_sim - 1.0) < 1e-5


def test_lsh_ann_recall_vs_brute_force(emb):
    dim = len(emb.first().embedding)
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = sim.brute_force_topk(emb, queries, k=3)
    approx = sim.lsh_ann_topk(emb, queries, dim=dim, k=3, n_planes=4)
    # self-match always lands in its own bucket → rank-1 recall is 100%
    a1 = {(r.query_id, r.vec_id) for r in approx.filter("rank=1").collect()}
    e1 = {(r.query_id, r.vec_id) for r in exact.filter("rank=1").collect()}
    assert a1 == e1


def test_ivf_ann_self_match(emb):
    from facebook_crawler_spark.operators.similarity import ivf_ann_topk

    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_ann_topk(emb, queries, k=3, n_centroids=8, n_probe=3)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        best = min(rs, key=lambda r: r.rank)
        # a query's own cell is always probed → self-match is rank 1
        assert best.vec_id == qid and abs(best.cos_sim - 1.0) < 1e-5


def test_embedding_near_dups_self_join(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.embedding_near_dups(df, threshold=0.99, dim=3, n_planes=4)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(1, 2)}


TEXTS = [
    (1, "The cat sat on the mat and it was happy for the day"),
    (2, "Der Hund ist nicht auf der Straße und das ist gut für ihn"),
    (3, "Le chat est sur le toit et il est content pour la journée"),
    (4, "zzz qqq xxx"),
    (5, ""),
]


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(TEXTS, ["doc_id", "text"]).cache()


def test_lang_id(texts):
    out = {r.doc_id: r.lang for r in texts.select("doc_id", tx.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr"
    assert out[4] == "und" and out[5] == "und"


def test_token_counts(texts):
    out = {
        r.doc_id: (r.tc, r.bc)
        for r in texts.select(
            "doc_id",
            tx.token_count(F.col("text")).alias("tc"),
            tx.bpe_ish_token_count(F.col("text")).alias("bc"),
        ).collect()
    }
    assert out[1][0] == 13
    assert out[5] == (0, 0)
    assert out[2][1] >= out[2][0]  # subword count ≥ word count


def test_quality_and_fingerprint(texts):
    rows = texts.select(
        "doc_id",
        tx.quality_score(F.col("text")).alias("q"),
        tx.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    assert by_id[1].q > by_id[5].q
    # fingerprint is whitespace-insensitive but order-sensitive
    assert by_id[1].fp != by_id[2].fp


def test_fingerprint_whitespace_invariance(spark):
    df = spark.createDataFrame([("a  b\tc",), ("a b c",), ("c b a",)], ["text"])
    fps = [r.fp for r in df.select(tx.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] and fps[0] != fps[2]
