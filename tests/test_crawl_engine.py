"""North-rule gates (BASELINE.json): the distributed engine reproduces the
reference simulator's crawl ordering + URL-seen set under the same seed
list and politeness budget; kill-resume converges to identical tables;
fetched payloads satisfy the per-row invariants (PSNR ≥ 40 dB lossy,
byte-exact captions)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.functions import images as img
from facebook_crawler_spark.sim.oracle import simulate
from facebook_crawler_spark.sources import synthetic as syn
from facebook_crawler_spark.streaming.round_runner import CrawlEngine

N_URLS = 3000
N_IMAGES = 1200
N_HOSTS = 20
ERROR_PERMILLE = 30


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    images = syn.gen_images(spark, N_IMAGES, partitions=8).cache()
    hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=40, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, N_URLS, n_images=N_IMAGES, n_hosts=N_HOSTS)
    return images, hosts, seeds


@pytest.fixture(scope="module")
def engine_run(spark, world, tmp_path_factory):
    images, hosts, seeds = world
    wd = str(tmp_path_factory.mktemp("engine"))
    eng = CrawlEngine(spark, wd, images, hosts, error_permille=ERROR_PERMILLE)
    eng.seed(seeds)
    stats = eng.run(max_rounds=50)
    return eng, stats


def _sim_result(spark, eng, hosts):
    frontier_rows = [r.asDict() for r in eng.frontier.read(spark).collect()]
    host_rows = [r.asDict() for r in hosts.collect()]
    return simulate(frontier_rows, host_rows, error_permille=ERROR_PERMILLE, max_rounds=50)


def test_crawl_order_matches_simulator(spark, world, engine_run):
    _, hosts, _ = world
    eng, stats = engine_run
    sim = _sim_result(spark, eng, hosts)

    engine_order = {
        (r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()
    }
    assert engine_order == set(sim.crawl_order)

    engine_seen = {r.url_hash for r in eng.seen_set().collect()}
    assert engine_seen == sim.seen
    assert len(engine_seen) > 0


def test_politeness_budget_respected(spark, engine_run):
    eng, _ = engine_run
    per_round_host = (
        eng.fetched.read(spark)
        .groupBy("fetch_round", "host")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()
    )
    assert per_round_host.mx <= 40  # token_rate


def test_ledger_lineage_consistent(spark, engine_run):
    eng, stats = engine_run
    ledger = eng.ledger.read(spark)
    led = ledger.groupBy("round").agg(
        F.sum("scheduled").alias("s"), F.sum("fetched").alias("f"), F.sum("errors").alias("e")
    )
    for row in led.collect():
        assert row.s == row.f + row.e
    # ledger totals equal the fetched table's rows
    total_sched = ledger.agg(F.sum("scheduled")).first()[0]
    assert total_sched == eng.fetched.read(spark).count()


def test_fetch_payload_invariants(spark, engine_run):
    """BASELINE.json input_hint: decoded-pixel PSNR ≥ 40dB (lossy) /
    exactness (lossless) + byte-exact captions vs the recomputation oracle."""
    eng, _ = engine_run
    # the in-round verifier must have passed every ok row
    bad = eng.fetched.read(spark).filter("status = 'ok' AND verified IS NOT true").count()
    assert bad == 0
    sample = eng.fetched.read(spark).filter("status = 'ok'").limit(40).collect()
    assert sample
    for r in sample:
        idx = int(r.image_id.split("_")[1])
        exp_bytes, w, h, fmt, exp_caption, _ = syn.image_row(idx)
        assert r.caption == exp_caption  # byte-exact caption
        got_fmt, got_arr = img.decode(bytes(r.bytes))
        ref_arr = img.pixels_for(idx, w, h)
        if got_fmt == "png":
            np.testing.assert_array_equal(got_arr, ref_arr)
        else:
            assert img.psnr(ref_arr, got_arr) >= 40.0


def test_resume_after_kill_is_identical(spark, world, engine_run, tmp_path_factory):
    """ST2: kill after round k, resume, final tables equal the
    uninterrupted run's."""
    images, hosts, seeds = world
    eng_full, _ = engine_run

    wd = str(tmp_path_factory.mktemp("engine_killed"))
    eng2 = CrawlEngine(spark, wd, images, hosts, error_permille=ERROR_PERMILLE)
    eng2.seed(seeds)
    for _ in range(3):
        eng2.run_round()
    # "kill": discard the driver object; a fresh engine resumes from tables
    eng3 = CrawlEngine(spark, wd, images, hosts, error_permille=ERROR_PERMILLE)
    assert eng3.committed_round() == 3
    eng3.run(max_rounds=50)

    full = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng_full.crawl_order().collect()}
    resumed = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng3.crawl_order().collect()}
    assert full == resumed
    s1 = {r.url_hash for r in eng_full.seen_set().collect()}
    s2 = {r.url_hash for r in eng3.seen_set().collect()}
    assert s1 == s2


def test_quarantine_alerts_match_simulator_and_survive_resume(spark, tmp_path_factory):
    """ST4/A4 alert channel: the alerts table's quarantine-transition rows
    (round, host, consecutive_errors) equal the simulator's events, and a
    crash after the host_state overwrite but BEFORE the ledger commit (the
    nastiest window: state already advanced, round not barriered) resumes
    to identical tables — the state input is pinned via commit metadata."""
    import os

    n, n_img = 600, 300
    images = syn.gen_images(spark, n_img, partitions=4).cache()
    hosts = syn.gen_hosts(spark, 8, token_rate=10, ban_threshold=4)
    seeds = syn.gen_frontier_seeds(spark, n, n_images=n_img, n_hosts=8)

    def run_all(wd, interrupt_after=None):
        eng = CrawlEngine(spark, wd, images, hosts, error_permille=450)
        eng.seed(seeds)
        if interrupt_after is not None:
            for _ in range(interrupt_after):
                eng.run_round()
            # crash injection: roll back the LEDGER barrier only — data,
            # host_state (with round meta) and alerts stay committed
            last = eng.ledger.current_version()
            os.remove(eng.ledger._manifest_path(last))
            eng2 = CrawlEngine(spark, wd, images, hosts, error_permille=450)
            assert eng2.committed_round() == interrupt_after - 1
            eng2.run(max_rounds=40)
            return eng2
        eng.run(max_rounds=40)
        return eng

    wd_full = str(tmp_path_factory.mktemp("alerts_full"))
    eng_full = run_all(wd_full)
    sim = _sim_result_permille(spark, eng_full, hosts, permille=450)
    assert sim.quarantine_events, "fixture must actually quarantine hosts"

    def alert_rows(eng):
        return {
            (r.round, r.host, r.consecutive_errors) for r in eng.alerts.read(spark).collect()
        }

    assert alert_rows(eng_full) == set(sim.quarantine_events)

    wd_kill = str(tmp_path_factory.mktemp("alerts_killed"))
    eng_resumed = run_all(wd_kill, interrupt_after=3)
    assert alert_rows(eng_resumed) == set(sim.quarantine_events)
    full = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng_full.crawl_order().collect()}
    resumed = {
        (r.round, r.host, r.host_rank, r.url_hash) for r in eng_resumed.crawl_order().collect()
    }
    assert full == resumed
    # final host_state identical too (quarantine counters converged)
    s_full = {tuple(r) for r in eng_full.host_state.read(spark).collect()}
    s_res = {tuple(r) for r in eng_resumed.host_state.read(spark).collect()}
    assert s_full == s_res


def test_double_crash_same_round_resumes_identical(spark, tmp_path_factory):
    """A round that crashes TWICE between the host_state overwrite and the
    ledger commit leaves two host_state versions tagged with that round; the
    third attempt must pin its state input back past BOTH. A single-step
    walk-back would pin to the first crashed attempt's post-update state and
    apply the consecutive-error update twice — premature quarantine and
    divergence from the uninterrupted run."""
    import os

    n, n_img = 600, 300
    images = syn.gen_images(spark, n_img, partitions=4).cache()
    hosts = syn.gen_hosts(spark, 8, token_rate=10, ban_threshold=4)
    seeds = syn.gen_frontier_seeds(spark, n, n_images=n_img, n_hosts=8)

    wd_full = str(tmp_path_factory.mktemp("dc_full"))
    eng_full = CrawlEngine(spark, wd_full, images, hosts, error_permille=450)
    eng_full.seed(seeds)
    eng_full.run(max_rounds=40)

    wd = str(tmp_path_factory.mktemp("dc_kill"))
    eng = CrawlEngine(spark, wd, images, hosts, error_permille=450)
    eng.seed(seeds)
    for _ in range(4):
        eng.run_round()
    for _ in range(2):  # crash round 4 twice: post-state, pre-ledger
        os.remove(eng.ledger._manifest_path(eng.ledger.current_version()))
        eng = CrawlEngine(spark, wd, images, hosts, error_permille=450)
        assert eng.committed_round() == 3
        eng.run_round()  # re-runs round 4, re-overwrites host_state meta
    # two host_state versions now carry meta round=4; final resume must
    # still converge to the uninterrupted run
    os.remove(eng.ledger._manifest_path(eng.ledger.current_version()))
    eng = CrawlEngine(spark, wd, images, hosts, error_permille=450)
    metas = [
        eng.host_state.commit_meta(v).get("round")
        for v in range(1, eng.host_state.current_version() + 1)
    ]
    assert metas.count(4) >= 2, metas  # the scenario actually happened
    eng.run(max_rounds=40)

    full = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng_full.crawl_order().collect()}
    resumed = {(r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()}
    assert full == resumed
    s_full = {tuple(r) for r in eng_full.host_state.read(spark).collect()}
    s_res = {tuple(r) for r in eng.host_state.read(spark).collect()}
    assert s_full == s_res


def _sim_result_permille(spark, eng, hosts, permille):
    frontier_rows = [r.asDict() for r in eng.frontier.read(spark).collect()]
    host_rows = [r.asDict() for r in hosts.collect()]
    return simulate(frontier_rows, host_rows, error_permille=permille, max_rounds=40)


def test_unknown_host_default_budget_matches_simulator(spark, tmp_path_factory):
    """Frontier hosts absent from the hosts dimension are scheduled with the
    simulator's default token_rate/ban_threshold (politeness.DEFAULT_*)
    instead of being silently dropped by the budget join — and their error/
    quarantine state is tracked from first contact (full-outer state join)."""
    n, n_img = 400, 300
    images = syn.gen_images(spark, n_img, partitions=4).cache()
    hosts = syn.gen_hosts(spark, 2, token_rate=7, ban_threshold=15)  # rogue hosts NOT in dim
    base = spark.range(0, n, 1, 4)
    host = (
        F.when(F.col("id") % 3 == 0, F.lit("rogue-a.test"))
        .when(F.col("id") % 3 == 1, F.lit("rogue-b.test"))
        .otherwise(F.lit("host-000.example.test"))
    )
    seeds = base.select(
        F.format_string("https://%s/item/img_%012d", host, F.col("id") % n_img).alias("url"),
        F.format_string("img_%012d", F.col("id") % n_img).alias("image_id"),
        host.alias("host"),
        F.lit(0).cast("int").alias("priority"),
        F.col("id").cast("long").alias("seed_rank"),
    )
    wd = str(tmp_path_factory.mktemp("engine_rogue"))
    eng = CrawlEngine(spark, wd, images, hosts, error_permille=ERROR_PERMILLE)
    eng.seed(seeds)
    eng.run(max_rounds=30)

    sim = _sim_result(spark, eng, hosts)
    engine_order = {
        (r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()
    }
    assert engine_order == set(sim.crawl_order)
    rogue_fetches = [t for t in engine_order if t[1].startswith("rogue-")]
    assert rogue_fetches, "unknown hosts must be crawled, not dropped"
    # unknown hosts entered the state table with the default budget
    state = eng.host_state.read(spark).filter(F.col("host").startswith("rogue-")).collect()
    assert {r.token_rate for r in state} == {50} and {r.ban_threshold for r in state} == {20}


def test_robots_never_fetched(spark, world, engine_run):
    images, hosts, seeds = world
    eng, _ = engine_run
    from facebook_crawler_spark.functions.urls import path_of

    fetched = eng.fetched.read(spark)
    joined = fetched.join(F.broadcast(hosts.select("host", "robots_disallow")), "host")
    violations = joined.filter(
        F.exists(F.col("robots_disallow"), lambda d: path_of(F.col("canonical_url")).startswith(d))
    )
    assert violations.count() == 0
