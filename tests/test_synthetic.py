"""Generator invariants (FIXTURES.md §1-§4): determinism, skew shape,
canonical-dup rate, payload recomputability."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_crawler_spark.functions import images as img
from facebook_crawler_spark.functions.urls import canonicalize_url_expr
from facebook_crawler_spark.sources import synthetic as syn


def test_images_deterministic_and_verifiable(spark):
    df = syn.gen_images(spark, 200, partitions=4)
    rows = df.orderBy("image_id").collect()
    assert len(rows) == 200
    assert rows[0].image_id == "img_000000000000"
    # spot-verify payloads against the recomputation oracle
    for r in [rows[0], rows[17], rows[199]]:
        idx = int(r.image_id.split("_")[1])
        b, w, h, fmt, caption, phash = syn.image_row(idx)
        assert bytes(r.bytes) == b
        assert (r.w, r.h, r.fmt, r.caption, r.phash) == (w, h, fmt, caption, phash)
        dec_fmt, arr = img.decode(bytes(r.bytes))
        assert dec_fmt == fmt and arr.shape == (h, w, 3)
    # two runs produce identical tables
    again = syn.gen_images(spark, 200, partitions=2).orderBy("image_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_frontier_seed_skew_and_dups(spark):
    n = 20_000
    seeds = syn.gen_frontier_seeds(spark, n, n_images=5_000).cache()
    assert seeds.count() == n
    hot = seeds.filter(F.col("host") == syn.HOT_HOST).count()
    assert 0.3 * n < hot < 0.5 * n  # hot host ~40%
    # ~8% of rows collapse onto an earlier canonical URL
    canon = seeds.select(canonicalize_url_expr(F.col("url")).alias("c"))
    distinct = canon.distinct().count()
    assert distinct < n * 0.97
    # seed_rank is (near-)unique and deterministic
    assert seeds.select("seed_rank").distinct().count() > n * 0.999
    seeds.unpersist()


def test_hosts_dimension(spark):
    hosts = syn.gen_hosts(spark, 50)
    rows = {r.host: r for r in hosts.collect()}
    assert len(rows) == 50
    assert rows[syn.HOT_HOST].salt_factor == 32
    assert all(r.token_rate == 50 and r.ban_threshold == 20 for r in rows.values())
    assert any(len(r.robots_disallow) > 0 for r in rows.values())


def test_listings_overlap_shape(spark):
    snap, scroll = syn.gen_listings(spark, n_snapshot=2000, n_scroll=1500)
    assert snap.count() == 2000 and scroll.count() == 1500
    snap_ids = snap.select("adId")
    overlap = scroll.join(snap_ids, "adId", "left_semi").count()
    assert 0.4 * 1500 < overlap < 0.8 * 1500
    # intra-scroll dups exist (last-wins fixture)
    assert scroll.select("adId").distinct().count() < 1500
