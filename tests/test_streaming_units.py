"""Unit tests: bloom seen-set, politeness budget rank (skew-safe top-k),
robots filter, host quarantine state machine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.streaming import politeness
from facebook_crawler_spark.streaming.seenset import build_bloom, split_by_bloom


def test_bloom_split_is_safe(spark):
    seen = spark.range(0, 1000).select((F.col("id") * 7919).alias("url_hash"))
    cands = spark.range(0, 3000).select((F.col("id") * 7919).alias("url_hash"))
    bloom = build_bloom(seen, m_bits=1 << 16)
    unseen, maybe = split_by_bloom(cands, bloom, m_bits=1 << 16)
    u = {r.url_hash for r in unseen.collect()}
    m = {r.url_hash for r in maybe.collect()}
    seen_set = {r.url_hash for r in seen.collect()}
    # no seen hash may land in 'definitely unseen'
    assert not (u & seen_set)
    # split is a partition of the candidates
    all_c = {r.url_hash for r in cands.collect()}
    assert u | m == all_c and not (u & m)
    # every seen candidate is in maybe (no false negatives)
    assert seen_set <= m
    # the bloom actually prunes: most unseen rows bypass
    assert len(u) > 1500


def test_cuckoo_split_is_safe(spark):
    """Same never-gambles contract as the bloom; precision should be much
    higher (≤ a handful of false positives on 2k unseen candidates)."""
    from facebook_crawler_spark.streaming.seenset import build_cuckoo, split_by_cuckoo

    seen = spark.range(0, 1000).select((F.col("id") * 7919).alias("url_hash"))
    cands = spark.range(0, 3000).select((F.col("id") * 7919).alias("url_hash"))
    table = build_cuckoo(seen, n_buckets=1 << 10)
    unseen, maybe = split_by_cuckoo(cands, table, n_buckets=1 << 10)
    u = {r.url_hash for r in unseen.collect()}
    m = {r.url_hash for r in maybe.collect()}
    seen_set = {r.url_hash for r in seen.collect()}
    assert not (u & seen_set)  # no false negatives routed past the filter
    all_c = {r.url_hash for r in cands.collect()}
    assert u | m == all_c and not (u & m)
    assert seen_set <= m
    # cuckoo precision: false positives ≪ bloom's (allow a small margin)
    assert len(m) - len(seen_set) < 20


def test_cuckoo_overflow_and_high_load(spark):
    """Evict-loop path: 3.5k keys into 1024x4 slots (85% load) still places
    everything with zero false negatives."""
    from facebook_crawler_spark.streaming.seenset import build_cuckoo, split_by_cuckoo

    seen = spark.range(0, 3500).select((F.col("id") * 104729 + 17).alias("url_hash"))
    table = build_cuckoo(seen, n_buckets=1 << 10)
    unseen, maybe = split_by_cuckoo(seen, table, n_buckets=1 << 10)
    assert unseen.count() == 0 and maybe.count() == 3500


def test_crawl_with_cuckoo_seen_filter_matches_bloom(spark, tmp_path_factory):
    """Engine end-to-end with seen_filter='cuckoo' reproduces the bloom
    engine's crawl order exactly (the filter only routes, never decides)."""
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine

    images = syn.gen_images(spark, 300, partitions=4).cache()
    hosts = syn.gen_hosts(spark, 5, token_rate=30, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, 1200, n_images=300, n_hosts=5)
    orders = []
    for variant in ("bloom", "cuckoo"):
        wd = str(tmp_path_factory.mktemp(f"seenf_{variant}"))
        eng = CrawlEngine(
            spark, wd, images, hosts, error_permille=50,
            seen_filter=variant, bloom_min_seen=100,  # force the filter path early
        )
        eng.seed(seeds)
        eng.run(max_rounds=30)
        orders.append({(r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()})
    assert orders[0] == orders[1] and orders[0]


def test_bloom_empty_seen(spark):
    seen = spark.range(0).select(F.col("id").alias("url_hash"))
    bloom = build_bloom(seen, m_bits=1 << 12)
    cands = spark.range(10).select(F.col("id").alias("url_hash"))
    unseen, maybe = split_by_bloom(cands, bloom, m_bits=1 << 12)
    assert unseen.count() == 10 and maybe.count() == 0


def test_bloom_tree_reduce_bit_identical(spark):
    """The tree OR-reduce (fixed-fan-in stages, driver collects one row)
    must produce the exact bytes of the direct per-partition collect —
    forced here with direct_collect_max=0 and fanin=2 over 16 partitions
    so at least ceil(log2(16)) = 4 tree stages actually run."""
    seen = spark.range(0, 5000, 1, 16).select((F.col("id") * 2654435761).alias("url_hash"))
    direct = build_bloom(seen, m_bits=1 << 14)
    tree = build_bloom(seen, m_bits=1 << 14, tree_fanin=2, direct_collect_max=0)
    assert direct == tree


def test_bloom_capped_no_false_negative(spark):
    """A bloom far too small for its key count (1024 bits, 5000 keys, k=1)
    saturates toward pass-through but NEVER reports an inserted key as
    definitely-unseen — the property that makes capping the frontier
    bloom's driver bytes safe (round_runner.bloom_driver_budget)."""
    seen = spark.range(0, 5000).select((F.col("id") * 7919 + 3).alias("url_hash"))
    bloom = build_bloom(seen, m_bits=1 << 10, k=1)
    unseen, maybe = split_by_bloom(seen, bloom, m_bits=1 << 10, k=1)
    assert unseen.count() == 0 and maybe.count() == 5000


def test_bloom_incremental_or_equals_batch(spark):
    """build(A) | build(B) == build(A ∪ B) bit-for-bit (same m, k) — the
    invariant the maintained frontier bloom's per-round OR fold relies on."""
    import numpy as np

    a = spark.range(0, 700).select((F.col("id") * 31 + 5).alias("url_hash"))
    b = spark.range(700, 1500).select((F.col("id") * 31 + 5).alias("url_hash"))
    both = a.unionByName(b)
    m = 1 << 13
    ba = np.frombuffer(build_bloom(a, m_bits=m, k=3), dtype=np.uint8)
    bb = np.frombuffer(build_bloom(b, m_bits=m, k=3), dtype=np.uint8)
    assert (ba | bb).tobytes() == build_bloom(both, m_bits=m, k=3)


def test_crawl_capped_bloom_matches_uncapped(spark, tmp_path_factory):
    """Discovery crawl with the frontier bloom capped to 128 driver bytes
    (1024 bits for a ~2k-URL frontier → heavy false positives, adapted k)
    reproduces the uncapped engine's crawl order exactly: the cap only
    widens the maybe-sliver routed to the exact dup check."""
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

    images = syn.gen_images(spark, 300, partitions=4, dim_span=9).cache()
    hosts = syn.gen_hosts(spark, 6, token_rate=40, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, 900, n_images=300, n_hosts=6)
    dcfg = DiscoveryConfig(n_images=300, n_hosts=6, hot_pct=40, hot_host=syn.HOT_HOST)
    orders = []
    for budget in (1 << 30, 128):
        wd = str(tmp_path_factory.mktemp(f"capb_{budget}"))
        eng = CrawlEngine(
            spark, wd, images, hosts, error_permille=50,
            discovery=dcfg, bloom_driver_budget=budget,
        )
        eng.seed(seeds)
        eng.run(max_rounds=30)
        assert len(eng._frontier_bloom) <= budget
        orders.append(
            {(r.round, r.host, r.host_rank, r.url_hash) for r in eng.crawl_order().collect()}
        )
    assert orders[0] == orders[1] and orders[0]


def _mk_pending(spark, rows):
    return spark.createDataFrame(
        rows, "host string, host_salt int, priority int, seed_rank long, url_hash long, canonical_url string"
    )


def test_budget_rank_matches_direct_topk(spark):
    import random

    rng = random.Random(7)
    rows = [
        ("hot.test", rng.randrange(8), rng.randrange(3), rng.randrange(10**6), i, "https://hot.test/i")
        for i in range(500)
    ] + [
        ("cold.test", 0, rng.randrange(3), rng.randrange(10**6), 10_000 + i, "https://cold.test/i")
        for i in range(30)
    ]
    pending = _mk_pending(spark, rows)
    budgets = spark.createDataFrame([("hot.test", 50), ("cold.test", 50)], "host string, budget int")
    got = politeness.budget_rank(pending, budgets)
    out = [(r.host, r.host_rank, r.url_hash) for r in got.collect()]
    # direct (skew-unsafe) reference: sort each host's rows, take 50
    exp = []
    for host in ("hot.test", "cold.test"):
        hr = sorted((r for r in rows if r[0] == host), key=lambda r: (r[2], r[3], r[4]))[:50]
        exp += [(host, i + 1, r[4]) for i, r in enumerate(hr)]
    assert sorted(out) == sorted(exp)
    # budget respected
    assert sum(1 for h, _, _ in out if h == "hot.test") == 50
    assert sum(1 for h, _, _ in out if h == "cold.test") == 30
    # the single-window form (elected by the engine for driver-known-small
    # rounds) must be byte-identical to the skew-safe two-stage default
    got1 = politeness.budget_rank(pending, budgets, two_stage=False)
    out1 = [(r.host, r.host_rank, r.url_hash) for r in got1.collect()]
    assert sorted(out1) == sorted(exp)
    assert sorted(got1.columns) == sorted(got.columns)


def test_robots_filter(spark):
    pending = _mk_pending(
        spark,
        [
            ("h.test", 0, 0, 1, 1, "https://h.test/private/x"),
            ("h.test", 0, 0, 2, 2, "https://h.test/public/x"),
            ("open.test", 0, 0, 3, 3, "https://open.test/private/x"),
        ],
    )
    hosts = spark.createDataFrame(
        [("h.test", ["/private"]), ("open.test", [])],
        "host string, robots_disallow array<string>",
    )
    kept = {r.url_hash for r in politeness.robots_filter(pending, hosts).collect()}
    assert kept == {2, 3}


def test_quarantine_state_machine(spark):
    state = spark.createDataFrame(
        [("a", 50, 5, 3, False), ("b", 50, 5, 4, False), ("idle", 50, 5, 2, False)],
        "host string, token_rate int, ban_threshold int, consecutive_errors int, quarantined boolean",
    )
    outcomes = spark.createDataFrame(
        [
            ("a", 10, 2, True),   # success mid-round → counter restarts at trailing run
            ("b", 3, 3, False),   # whole round failed → accumulates 4+3=7 ≥ 5 → quarantined
        ],
        "host string, n_items long, trailing_blocked int, any_ok boolean",
    )
    new = {r.host: r for r in politeness.update_host_state(state, outcomes).collect()}
    assert new["a"].consecutive_errors == 2 and not new["a"].quarantined
    assert new["b"].consecutive_errors == 7 and new["b"].quarantined
    assert new["idle"].consecutive_errors == 2 and not new["idle"].quarantined


def test_positions_match_bigint_reference():
    """The uint64 limb-split double-hash must be bit-identical to the
    big-int (object-dtype) formulation it replaced, across the full int64
    range including the overflow edges."""
    import numpy as np

    from facebook_crawler_spark.streaming.seenset import (
        MOD,
        _cuckoo_parts,
        _positions,
    )

    def ref_positions(h, m_bits, k):
        h1 = np.abs(h.astype(np.int64).astype(object)) % MOD
        h2 = (h1 * 0x9E3779B97F4A7C15 + 0x85EBCA6B) % MOD
        return np.stack(
            [(h1 + i * h2) % MOD % m_bits for i in range(k)], axis=1
        ).astype(np.int64)

    def ref_cuckoo(h, n_buckets):
        h1 = np.abs(h.astype(np.int64).astype(object)) % MOD
        h2 = (h1 * 0x9E3779B97F4A7C15 + 0x85EBCA6B) % MOD
        fp = (h2.astype(np.uint64) >> np.uint64(20)).astype(np.uint64) & np.uint64(0xFFFF)
        fp = np.where(fp == 0, 1, fp).astype(np.uint16)
        i1 = (h1 % n_buckets).astype(np.int64)
        return i1, fp

    rng = np.random.default_rng(7)
    edges = np.array(
        [0, 1, -1, 2**63 - 1, -(2**63), -(2**63) + 1, MOD, MOD - 1, -MOD, 25, -25],
        dtype=np.int64,
    )
    h = np.concatenate([edges, rng.integers(-(2**63), 2**63 - 1, 20000, dtype=np.int64)])
    for m_bits in (1 << 10, 1 << 20, 1 << 23):
        np.testing.assert_array_equal(_positions(h, m_bits, 5), ref_positions(h, m_bits, 5))
    for n_buckets in (1 << 10, 1 << 17):
        i1_new, fp_new = _cuckoo_parts(h, n_buckets)
        i1_ref, fp_ref = ref_cuckoo(h, n_buckets)
        np.testing.assert_array_equal(i1_new, i1_ref)
        np.testing.assert_array_equal(fp_new, fp_ref)
