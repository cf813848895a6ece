"""All scale features COMPOSED (the 100-TB production configuration):
bucketed on-disk images (schedule-pruned fetch scan), bucketed frontier
(pruned discovery dup-check), driver-budget-clamped bloom, and the
cold-start bloom prebuild — all on at once, plus a mid-run kill/resume.
Each knob is pinned individually elsewhere (test_fetch_pruning,
test_frontier_bucketing, test_streaming_units, test_discovery); this
guards their interactions: the composed engine must reproduce the plain
engine's crawl order and seen set bit-for-bit."""

from __future__ import annotations

import pytest

from facebook_crawler_spark.sources import synthetic as syn
from facebook_crawler_spark.sources.layout import (
    read_bucketed_images,
    write_bucketed_images,
)
from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

N_IMAGES = 150
N_SEED_IMAGES = 180  # > N_IMAGES: the pruned-miss path stays exercised
N_URLS = 400
N_HOSTS = 5
N_IMG_BUCKETS = 32
N_F_BUCKETS = 8
# small enough that the 10-bits/key sizing hits the clamp on this frontier
# (~1k rows after discovery -> need > 1 KiB) — forces the clamped-k path
# while remaining safe by route-never-decide
BLOOM_BUDGET = 1024
DCFG = dict(n_images=N_IMAGES, n_hosts=N_HOSTS, hot_pct=40, hot_host=syn.HOT_HOST, max_out=3)
ERR = 50
MAX_ROUNDS = 25


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    images = syn.gen_images(spark, N_IMAGES, partitions=4, dim_span=9).cache()
    path = str(tmp_path_factory.mktemp("compimg") / "images")
    write_bucketed_images(images, path, N_IMG_BUCKETS)
    disk = read_bucketed_images(spark, path)
    hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=40, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, N_URLS, n_images=N_SEED_IMAGES, n_hosts=N_HOSTS)
    return images, disk, hosts, seeds


def _mk_composed(spark, wd, disk, hosts):
    return CrawlEngine(
        spark, wd, disk, hosts, error_permille=ERR,
        discovery=DiscoveryConfig(**DCFG),
        images_n_buckets=N_IMG_BUCKETS,
        frontier_n_buckets=N_F_BUCKETS,
        bloom_driver_budget=BLOOM_BUDGET,
        prebuild_bloom=True,
    )


def _order(eng):
    return {(r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()}


@pytest.fixture(scope="module")
def composed_run(spark, world, tmp_path_factory):
    """One uninterrupted run of the fully composed engine, shared by both
    comparisons below."""
    _, disk, hosts, seeds = world
    wd = str(tmp_path_factory.mktemp("comp_all"))
    eng = _mk_composed(spark, wd, disk, hosts)
    eng.seed(seeds)
    eng.run(max_rounds=MAX_ROUNDS)
    return eng


def test_composed_scale_config_matches_plain(spark, world, composed_run, tmp_path_factory):
    images, _, hosts, seeds = world
    eng = composed_run
    # the clamp actually bit (budget bytes * 8 bits is the ceiling)
    assert eng._frontier_bloom_bits == BLOOM_BUDGET * 8

    wd_plain = str(tmp_path_factory.mktemp("comp_plain"))
    plain = CrawlEngine(
        spark, wd_plain, images, hosts, error_permille=ERR,
        discovery=DiscoveryConfig(**DCFG),
    )
    plain.seed(seeds)
    stats = plain.run(max_rounds=MAX_ROUNDS)
    assert sum(s["discovered"] for s in stats) > 0

    assert _order(eng) == _order(plain) and _order(plain)
    assert {r.url_hash for r in eng.seen_set().collect()} == {
        r.url_hash for r in plain.seen_set().collect()
    }
    # the pruned-miss interaction stayed live under composition
    assert eng.fetched.read(spark).filter("status = 'missing'").count() > 0


def test_composed_kill_resume_identical(spark, world, composed_run, tmp_path_factory):
    """Kill the composed engine after 2 rounds; a fresh composed engine
    (cold caches -> resume-path pending rebuild + prebuilt clamped bloom
    over the BUCKETED frontier) must converge to the identical crawl."""
    _, disk, hosts, seeds = world

    wd = str(tmp_path_factory.mktemp("comp_kill"))
    e1 = _mk_composed(spark, wd, disk, hosts)
    e1.seed(seeds)
    for _ in range(2):
        e1.run_round()
    e2 = _mk_composed(spark, wd, disk, hosts)
    e2.run(max_rounds=MAX_ROUNDS)

    assert _order(e2) == _order(composed_run) and _order(composed_run)
