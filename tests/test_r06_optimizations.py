"""Round-6 optimization internals: every transformation must be
result-identical — spread (scan-parallelism repair), the md5u base-hash
materialization, shingle-table reuse, phash64's reduceat fast path and
batch form, the gradient memo, and the vectorized fetch verifier."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.functions import images as img
from facebook_crawler_spark.operators.partitioning import spread


def test_spread_repartitions_narrow_input(spark):
    df = spark.range(0, 1000, 1, 1).withColumn("v", F.col("id") * 2)
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_spread_noop_on_wide_input(spark):
    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism + 4)
    assert spread(wide) is wide


def test_spread_noop_on_exchange_bearing_plan(spark):
    # downstream of a shuffle the parallelism is already the cluster's;
    # probing such a plan via .rdd would eagerly run its query stages
    agg = spark.range(0, 1000, 1, 4).groupBy((F.col("id") % 7).alias("k")).count()
    assert spread(agg) is agg


def test_minhash_shingles_df_reuse_identical(spark):
    from facebook_crawler_spark.operators.dedup import (
        minhash_lsh_candidates,
        shingle_table,
        verify_near_dups,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base_c = minhash_lsh_candidates(d, "doc_id", "text", 16, 4, hash_family="md5u")
    base_v = verify_near_dups(base_c, d, "doc_id", "text", threshold=0.5)
    sh = shingle_table(d, "doc_id", "text").localCheckpoint(eager=False)
    opt_c = minhash_lsh_candidates(
        d, "doc_id", "text", 16, 4, hash_family="md5u", shingles_df=sh
    )
    opt_v = verify_near_dups(opt_c, d, "doc_id", "text", threshold=0.5, shingles_df=sh)
    assert sorted(map(tuple, base_c.collect())) == sorted(map(tuple, opt_c.collect()))
    assert sorted(map(tuple, base_v.collect())) == sorted(map(tuple, opt_v.collect()))


def _phash64_integral_reference(arr: np.ndarray) -> int:
    """The pre-round-6 integral-image formulation, kept as the oracle for
    the reduceat fast path."""
    h, w = arr.shape[:2]
    s = arr.sum(axis=-1, dtype=np.int64)
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(s, axis=0, out=ii[1:, 1:])
    np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    ye = np.maximum(ys[1:], ys[:-1] + 1)
    xe = np.maximum(xs[1:], xs[:-1] + 1)
    y0, x0 = ys[:-1], xs[:-1]
    sums = ii[np.ix_(ye, xe)] - ii[np.ix_(y0, xe)] - ii[np.ix_(ye, x0)] + ii[np.ix_(y0, x0)]
    counts = (ye - y0)[:, None] * (xe - x0)[None, :]
    blocks = sums / (3.0 * counts)
    bits = (blocks > blocks.mean()).flatten()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def test_phash64_fast_path_and_batch_bit_identical():
    for idx in range(60):
        w = 8 + (idx * 11) % 150
        h = 8 + (idx * 17) % 150
        arr = img.pixels_for(idx, w, h)
        want = _phash64_integral_reference(arr)
        assert img.phash64(arr) == want
        stack = np.stack([img.pixels_for(idx * 100 + k, w, h) for k in range(5)])
        got = img.phash64_batch(stack)
        assert list(got) == [_phash64_integral_reference(stack[k]) for k in range(5)]
    # tiny-dims fallback still matches the reference (overlapping blocks)
    for w, h in [(1, 1), (3, 5), (7, 9), (5, 64)]:
        arr = img.pixels_for(1, w, h)
        assert img.phash64(arr) == _phash64_integral_reference(arr)
    with pytest.raises(ValueError):
        img.phash64_batch(np.zeros((1, 4, 4, 3), dtype=np.uint8))


def test_pixels_for_gradient_memo_bit_identical():
    def pixels_ref(index, w, h):
        rng = np.random.Generator(np.random.PCG64(0xFACE_B00C + index))
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        grad = np.empty((h, w, 3), dtype=np.uint8)
        grad[..., 0] = ((x * 255) // max(w - 1, 1)).astype(np.uint8)[None, :]
        grad[..., 1] = ((y * 255) // max(h - 1, 1)).astype(np.uint8)[:, None]
        grad[..., 2] = ((x[None, :] + y[:, None]) % 256).astype(np.uint8)
        noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
        return (grad.astype(np.uint16) + noise).clip(0, 255).astype(np.uint8)

    for idx in range(50):
        w = 1 + (idx * 7) % 140
        h = 1 + (idx * 13) % 140
        np.testing.assert_array_equal(img.pixels_for(idx, w, h), pixels_ref(idx, w, h))


def test_vectorized_verifier_matches_scalar_semantics(spark):
    from facebook_crawler_spark.sources.synthetic import caption_for, image_row
    from facebook_crawler_spark.streaming.round_runner import _verify_udf

    rows = [image_row(i, 97) for i in range(200)]
    ids = [f"img_{i:012d}" for i in range(200)]
    bufs = [r[0] for r in rows]
    caps = [r[4] for r in rows]
    phs = [str(r[5]) for r in rows]
    # corruption menu: truncated payload, bad magic, wrong caption,
    # flipped phash bit, null payload, unparsable id
    bufs[5] = bufs[5][:20]
    bufs[17] = b"XXXX" + bufs[17][4:]
    caps[23] = "wrong caption"
    phs[31] = str(int(phs[31]) ^ 1)
    bufs[41] = None
    ids[53] = "garbage"
    f = _verify_udf().func
    res = f(pd.Series(ids), pd.Series(bufs), pd.Series(caps), pd.Series(phs))
    for i in range(200):
        if bufs[i] is None:
            want = None
        else:
            try:
                idx = int(ids[i].split("_")[1])
                fmt, arr = img.decode(bytes(bufs[i]))
                ref = img.pixels_for(idx, arr.shape[1], arr.shape[0])
                pok = (
                    np.array_equal(arr, ref) if fmt == "png" else img.psnr(ref, arr) >= 40.0
                )
                want = bool(
                    pok and caps[i] == caption_for(idx) and img.phash64(arr) == int(phs[i])
                )
            except Exception:
                want = False
        assert res[i] == want, (i, res[i], want)


def test_inline_and_slim_verify_paths_identical(spark, tmp_path):
    """The verify-path election (inline verdict in the append plan vs slim
    projection + failures broadcast) must produce byte-identical fetched
    tables — same verified tri-state on every row."""
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine

    images = syn.gen_images(spark, 60, partitions=2, dim_span=9)
    hosts = syn.gen_hosts(spark, 4, token_rate=40)
    seeds = syn.gen_frontier_seeds(spark, 200, n_images=60, n_hosts=4)
    outs = {}
    for label, inline_max in (("inline", 1 << 30), ("slim", 0)):
        wd = str(tmp_path / label)
        eng = CrawlEngine(
            spark, wd, images, hosts, error_permille=150,
            verify_payloads=True, store_payloads=True,
            inline_verify_max=inline_max,
        )
        eng.seed(seeds)
        eng.run(max_rounds=8)
        outs[label] = sorted(
            map(tuple, eng.fetched.read(spark).select(
                "url_hash", "fetch_round", "status", "verified"
            ).collect())
        )
    assert outs["inline"] == outs["slim"] and len(outs["inline"]) > 0


def test_table_last_appended_dir_contract(spark, tmp_path):
    """`Table.last_appended_dir` (the crawl round's stats source) must point
    at a directory holding EXACTLY the appended rows, and reset to None on
    an empty (no-op) append."""
    from facebook_crawler_spark.sources.tables import Table

    t = Table(str(tmp_path / "t"))
    assert t.last_appended_dir is None
    t.append(spark.range(0, 5).withColumn("v", F.col("id") * 10))
    d1 = t.last_appended_dir
    assert d1 is not None
    assert sorted(r.id for r in spark.read.parquet(d1).collect()) == [0, 1, 2, 3, 4]
    # empty append: either a commit-level no-op (marker cleared) or a
    # schema-only commit (marker points at a 0-row dir) — both satisfy the
    # stats contract (the dir holds exactly the appended rows)
    v_before = t.current_version()
    t.append(spark.range(0, 0).withColumn("v", F.col("id") * 10))
    if t.last_appended_dir is None:
        assert t.current_version() == v_before
    else:
        assert spark.read.parquet(t.last_appended_dir).count() == 0
    # next real append: marker moves to the NEW dir only
    t.append(spark.range(5, 8).withColumn("v", F.col("id") * 10))
    d2 = t.last_appended_dir
    assert d2 is not None and d2 != d1
    assert sorted(r.id for r in spark.read.parquet(d2).collect()) == [5, 6, 7]
    # the table itself still reads the union of all committed rows
    assert sorted(
        r.id for r in t.read(spark).select("id").collect()
    ) == list(range(8))


def test_shingles_zipwith_contract(spark):
    """The zip_with shingle construction must reproduce the documented
    contract of the old slice+concat_ws form exactly: k-gram strings in
    first-occurrence order, distinct, empty for NULL/short docs."""
    from facebook_crawler_spark.operators.dedup import shingles, tokens_of

    rows = [(0, None), (1, ""), (2, "one"), (3, "one two"),
            (4, "one two three"), (5, "a b c d"), (6, "x x x x x"),
            (7, "  padded   text  here  !! "), (8, "b a b a b a b")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: r.sh
        for r in df.select(
            "id", shingles(tokens_of(F.col("text")), 3).alias("sh")
        ).collect()
    }
    assert got == {
        0: [], 1: [], 2: [], 3: [],
        4: ["one two three"],
        5: ["a b c", "b c d"],
        6: ["x x x"],
        7: ["padded text here"],
        8: ["b a b", "a b a"],  # distinct, first-occurrence order
    }
    # reference re-implementation sweep (the retired transform+slice form)
    ref = df.select(
        "id",
        F.when(
            F.size(tokens_of(F.col("text"))) >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(tokens_of(F.col("text"))) - 2),
                    lambda i: F.concat_ws(
                        " ", F.slice(tokens_of(F.col("text")), i, 3)
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>")).alias("sh"),
    )
    assert got == {r.id: r.sh for r in ref.collect()}
