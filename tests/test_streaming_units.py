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


def test_bloom_empty_seen(spark):
    seen = spark.range(0).select(F.col("id").alias("url_hash"))
    bloom = build_bloom(seen, m_bits=1 << 12)
    cands = spark.range(10).select(F.col("id").alias("url_hash"))
    unseen, maybe = split_by_bloom(cands, bloom, m_bits=1 << 12)
    assert unseen.count() == 10 and maybe.count() == 0


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
