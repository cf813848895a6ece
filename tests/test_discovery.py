"""Discovery stage (SURVEY.md §3.3): outlink expansion appends to the
frontier; engine matches the simulator; crash-resume stays identical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.sim.oracle import simulate
from facebook_crawler_spark.sources import synthetic as syn
from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

N_URLS = 1200
N_IMAGES = 800
N_HOSTS = 12
ERR = 25

DCFG = dict(n_images=N_IMAGES, n_hosts=N_HOSTS, hot_pct=40, hot_host=syn.HOT_HOST, max_out=3)


@pytest.fixture(scope="module")
def world(spark):
    images = syn.gen_images(spark, N_IMAGES, partitions=4, dim_span=9).cache()
    hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=60, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, N_URLS, n_images=N_IMAGES, n_hosts=N_HOSTS)
    return images, hosts, seeds


@pytest.fixture(scope="module")
def engine_run(spark, world, tmp_path_factory):
    images, hosts, seeds = world
    wd = str(tmp_path_factory.mktemp("disc"))
    eng = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR, discovery=DiscoveryConfig(**DCFG)
    )
    eng.seed(seeds)
    stats = eng.run(max_rounds=60)
    return eng, stats


def test_discovery_grows_frontier(spark, engine_run):
    eng, stats = engine_run
    assert sum(s["discovered"] for s in stats) > 0
    frontier = eng.frontier.read(spark)
    assert frontier.filter("discovered_round > 0").count() > 0
    # discovered rows are eventually fetched
    fetched_disc = (
        eng.fetched.read(spark)
        .join(frontier.filter("discovered_round > 0").select("url_hash"), "url_hash", "left_semi")
        .count()
    )
    assert fetched_disc > 0


def test_discovery_crawl_order_matches_simulator(spark, world, engine_run):
    _, hosts, _ = world
    eng, _ = engine_run
    # feed the simulator ONLY the seeded rows (discovered_round = 0); it
    # derives all discoveries itself — an independent replication
    frontier_rows = [
        r.asDict()
        for r in eng.frontier.read(spark).filter("discovered_round = 0").collect()
    ]
    host_rows = [r.asDict() for r in hosts.collect()]
    sim = simulate(frontier_rows, host_rows, error_permille=ERR, max_rounds=60, discovery=DCFG)

    engine_order = {
        (r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()
    }
    assert engine_order == set(sim.crawl_order)
    assert {r.url_hash for r in eng.seen_set().collect()} == sim.seen


def test_discovery_fnv_mode_matches_simulator(spark, tmp_path_factory):
    """hash_mode="fnv" (the opt-in sim-parity hash family) still reproduces
    the simulator exactly — discovery children are hashed by the Arrow FNV
    UDF engine-side and by the oracle's independent FNV in Python."""
    n, n_img, n_hosts = 300, 200, 6
    dcfg = dict(n_images=n_img, n_hosts=n_hosts, hot_pct=40, hot_host=syn.HOT_HOST, max_out=3)
    images = syn.gen_images(spark, n_img, partitions=4).cache()
    hosts = syn.gen_hosts(spark, n_hosts, token_rate=30, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, n, n_images=n_img, n_hosts=n_hosts)
    wd = str(tmp_path_factory.mktemp("disc_fnv"))
    eng = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR,
        discovery=DiscoveryConfig(**dcfg), hash_mode="fnv",
    )
    eng.seed(seeds)
    eng.run(max_rounds=20)
    frontier_rows = [
        r.asDict() for r in eng.frontier.read(spark).filter("discovered_round = 0").collect()
    ]
    host_rows = [r.asDict() for r in hosts.collect()]
    sim = simulate(
        frontier_rows, host_rows, error_permille=ERR, max_rounds=20,
        discovery=dcfg, hash_mode="fnv",
    )
    engine_order = {
        (r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()
    }
    assert engine_order == set(sim.crawl_order)


def test_discovery_resume_identical(spark, world, engine_run, tmp_path_factory):
    images, hosts, seeds = world
    eng_full, _ = engine_run

    wd = str(tmp_path_factory.mktemp("disc_kill"))
    eng2 = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR, discovery=DiscoveryConfig(**DCFG)
    )
    eng2.seed(seeds)
    for _ in range(2):
        eng2.run_round()
    eng3 = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR, discovery=DiscoveryConfig(**DCFG)
    )
    eng3.run(max_rounds=60)

    full = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng_full.crawl_order().collect()}
    resumed = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng3.crawl_order().collect()}
    assert full == resumed


def test_resume_prebuild_off_identical(spark, world, engine_run, tmp_path_factory):
    """prebuild_bloom toggles only WHEN the discovery bloom is built
    (staged in the pool at run() start vs inline at the first discovery) —
    never what it contains: a resumed crawl with the prebuild disabled is
    identical to the uninterrupted default-config run (whose resume twin,
    prebuild ON, is pinned by test_discovery_resume_identical)."""
    images, hosts, seeds = world
    eng_full, _ = engine_run

    wd = str(tmp_path_factory.mktemp("disc_kill_npb"))
    eng2 = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR,
        discovery=DiscoveryConfig(**DCFG), prebuild_bloom=False,
    )
    eng2.seed(seeds)
    for _ in range(2):
        eng2.run_round()
    eng3 = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR,
        discovery=DiscoveryConfig(**DCFG), prebuild_bloom=False,
    )
    eng3.run(max_rounds=60)

    full = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng_full.crawl_order().collect()}
    resumed = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng3.crawl_order().collect()}
    assert full == resumed


def test_shuffle_fetch_join_matches_simulator(spark, world, tmp_path_factory):
    """fetch_join="shuffle" (the bulk-drain scale path: shuffle-hash join
    where only the slim schedule crosses an exchange) produces the same
    crawl order and seen set as the simulator — strategy changes the
    physical plan only, never the semantics. Images are pre-partitioned by
    image_id as the bench/Iceberg-bucket layout would be."""
    images, hosts, seeds = world
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    images_part = images.repartition(n_shuffle, "image_id")
    wd = str(tmp_path_factory.mktemp("disc_shuf"))
    eng = CrawlEngine(
        spark, wd, images_part, hosts, error_permille=ERR,
        discovery=DiscoveryConfig(**DCFG), fetch_join="shuffle",
    )
    eng.seed(seeds)
    eng.run(max_rounds=60)
    frontier_rows = [
        r.asDict() for r in eng.frontier.read(spark).filter("discovered_round = 0").collect()
    ]
    host_rows = [r.asDict() for r in hosts.collect()]
    sim = simulate(frontier_rows, host_rows, error_permille=ERR, max_rounds=60, discovery=DCFG)
    engine_order = {
        (r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()
    }
    assert engine_order == set(sim.crawl_order)
    assert {r.url_hash for r in eng.seen_set().collect()} == sim.seen


def test_incremental_pending_matches_full_rebuild(spark, world, tmp_path_factory):
    """The maintained pending set (pending ∖ ok ∪ children per round) must
    equal the from-tables rebuild (frontier ∖ seen) at any stopping point —
    the invariant that makes it a pure accelerator."""
    images, hosts, seeds = world
    wd = str(tmp_path_factory.mktemp("pinv"))
    eng = CrawlEngine(
        spark, wd, images, hosts, error_permille=ERR, discovery=DiscoveryConfig(**DCFG)
    )
    eng.seed(seeds)
    for _ in range(4):  # stop mid-crawl so the drained-path drop doesn't fire
        eng.run_round()
    maintained = {r.url_hash for r in eng._pending().select("url_hash").collect()}
    # force the full rebuild path a fresh process would take
    eng._seen_df = None
    rebuilt = {r.url_hash for r in eng.pending().select("url_hash").collect()}
    assert maintained == rebuilt and len(maintained) > 0
