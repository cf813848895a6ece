"""Bucketed frontier layout (CrawlEngine frontier_n_buckets + Table
partition_by): the discovery dup-check prunes its frontier scan to the
maybe-sliver's buckets, and results stay bit-identical to the plain
engine."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.sources import synthetic as syn
from facebook_crawler_spark.sources.tables import Table
from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

N_IMAGES = 250
N_URLS = 800
N_HOSTS = 6
NB = 16
DCFG = dict(n_images=N_IMAGES, n_hosts=N_HOSTS, hot_pct=40, hot_host=syn.HOT_HOST, max_out=3)


def test_table_partitioned_append_read(spark, tmp_path):
    t = Table(str(tmp_path / "pt"))
    a = spark.range(100).select(
        F.col("id").alias("url_hash"), F.pmod(F.col("id"), F.lit(8)).cast("int").alias("p_fbucket")
    )
    b = spark.range(100, 160).select(
        F.col("id").alias("url_hash"), F.pmod(F.col("id"), F.lit(8)).cast("int").alias("p_fbucket")
    )
    v1 = t.overwrite(a, partition_by=["p_fbucket"])
    v2 = t.append(b, partition_by=["p_fbucket"])
    assert (v1, v2) == (1, 2)
    assert t.read(spark).count() == 160
    assert t.read(spark, version=1).count() == 100  # time travel intact
    # partition filter above the per-commit union pushes into BOTH scans
    pruned = t.read(spark).filter(F.col("p_fbucket").isin([1, 3]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("PartitionFilters: [p_fbucket") >= 2 or (
        plan.count("PartitionFilters") >= 2 and "p_fbucket" in plan
    )
    assert pruned.count() == sum(1 for i in range(160) if i % 8 in (1, 3))
    # spec consistency is enforced
    with pytest.raises(ValueError):
        t.append(a.drop("p_fbucket"))


@pytest.fixture(scope="module")
def world(spark):
    images = syn.gen_images(spark, N_IMAGES, partitions=4, dim_span=9).cache()
    hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=40, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, N_URLS, n_images=N_IMAGES, n_hosts=N_HOSTS)
    return images, hosts, seeds


def _order(spark, eng):
    return {(r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()}


def test_bucketed_frontier_matches_plain(spark, world, tmp_path_factory):
    images, hosts, seeds = world
    orders, seens = [], []
    for nb in (0, NB):
        wd = str(tmp_path_factory.mktemp(f"fb_{nb}"))
        eng = CrawlEngine(
            spark, wd, images, hosts, error_permille=50,
            discovery=DiscoveryConfig(**DCFG), frontier_n_buckets=nb,
        )
        eng.seed(seeds)
        stats = eng.run(max_rounds=30)
        assert sum(s["discovered"] for s in stats) > 0  # dup-check exercised
        orders.append(_order(spark, eng))
        seens.append({r.url_hash for r in eng.seen_set().collect()})
    assert orders[0] == orders[1] and orders[0]
    assert seens[0] == seens[1]


def test_bucketed_frontier_kill_resume(spark, world, tmp_path_factory):
    images, hosts, seeds = world
    wd_full = str(tmp_path_factory.mktemp("fb_full"))
    eng_full = CrawlEngine(
        spark, wd_full, images, hosts, error_permille=50,
        discovery=DiscoveryConfig(**DCFG), frontier_n_buckets=NB,
    )
    eng_full.seed(seeds)
    eng_full.run(max_rounds=30)

    wd = str(tmp_path_factory.mktemp("fb_res"))
    e1 = CrawlEngine(
        spark, wd, images, hosts, error_permille=50,
        discovery=DiscoveryConfig(**DCFG), frontier_n_buckets=NB,
    )
    e1.seed(seeds)
    for _ in range(3):
        e1.run_round()
    e2 = CrawlEngine(
        spark, wd, images, hosts, error_permille=50,
        discovery=DiscoveryConfig(**DCFG), frontier_n_buckets=NB,
    )
    e2.run(max_rounds=30)
    assert _order(spark, e2) == _order(spark, eng_full)


def test_dup_scan_plan_is_pruned(spark, world, tmp_path_factory):
    """_dup_hashes_for's frontier scan carries the maybe-bucket
    PartitionFilters when the frontier is bucketed."""
    images, hosts, seeds = world
    wd = str(tmp_path_factory.mktemp("fb_plan"))
    eng = CrawlEngine(
        spark, wd, images, hosts, error_permille=50,
        discovery=DiscoveryConfig(**DCFG), frontier_n_buckets=NB,
    )
    eng.seed(seeds)
    eng.run_round()
    maybe = eng.frontier.read(spark).select("url_hash").limit(20)
    dup = eng._dup_hashes_for(maybe)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dup.explain("formatted")
    plan = buf.getvalue()
    # the pushed bucket predicate renders as INSET/IN for wide sets and as
    # an equality (or OR-chain) for narrow ones — accept any concrete
    # p_fbucket constraint beyond the bare isnotnull
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert lines and any(
        "p_fbucket" in ln and ("INSET" in ln or " IN " in ln or "=" in ln)
        for ln in lines
    )
    # the pruned dup set equals the exact one
    exact = (
        eng.frontier.read(spark).select("url_hash")
        .join(F.broadcast(maybe), "url_hash", "left_semi")
    )
    assert {r.url_hash for r in dup.collect()} == {r.url_hash for r in exact.collect()}


def test_table_compact(spark, tmp_path):
    """Table.compact (Iceberg rewrite_data_files analog): same rows, same
    partition spec, ONE data dir, old versions readable until expired."""
    t = Table(str(tmp_path / "ct"))
    for lo in (0, 40, 80):
        df = spark.range(lo, lo + 40).select(
            F.col("id").alias("url_hash"),
            F.pmod(F.col("id"), F.lit(4)).cast("int").alias("p_fbucket"),
        )
        (t.overwrite if lo == 0 else t.append)(df, partition_by=["p_fbucket"])
    assert t.data_dir_count() == 3
    v_before = t.current_version()
    rows_before = {r.url_hash for r in t.read(spark).collect()}
    v_after = t.compact(spark)
    assert v_after == v_before + 1 and t.data_dir_count() == 1
    assert {r.url_hash for r in t.read(spark).collect()} == rows_before
    assert t._partition_by() == ["p_fbucket"]
    # partition pruning still works on the compacted layout
    assert t.read(spark).filter("p_fbucket = 2").count() == 30
    # time travel intact until expire
    assert t.read(spark, version=v_before).count() == 120
    t.expire_versions(keep_last=1)
    assert t.read(spark).count() == 120
    # compacting a single-dir snapshot is a no-op
    assert t.compact(spark) == v_after


def test_compacting_crawl_matches_plain(spark, world, tmp_path_factory):
    """frontier_compact_dirs keeps the bucketed frontier's union width
    bounded while leaving the crawl bit-identical to the plain engine."""
    images, hosts, seeds = world
    wd_p = str(tmp_path_factory.mktemp("fbc_plain"))
    plain = CrawlEngine(
        spark, wd_p, images, hosts, error_permille=50,
        discovery=DiscoveryConfig(**DCFG),
    )
    plain.seed(seeds)
    plain.run(max_rounds=30)

    wd_c = str(tmp_path_factory.mktemp("fbc_comp"))
    eng = CrawlEngine(
        spark, wd_c, images, hosts, error_permille=50,
        discovery=DiscoveryConfig(**DCFG), frontier_n_buckets=NB,
        frontier_compact_dirs=3,
    )
    eng.seed(seeds)
    stats = eng.run(max_rounds=30)
    assert sum(s["discovered"] for s in stats) > 3  # compaction fired
    assert eng.frontier.data_dir_count() <= 3
    assert _order(spark, eng) == _order(spark, plain)
    assert {r.url_hash for r in eng.seen_set().collect()} == {
        r.url_hash for r in plain.seen_set().collect()
    }
