"""Per-host politeness: token-bucket budget rank, robots filter, quarantine.

Replaces the reference's sleep pools / per-proxy chunk caps / ban counters
(reference config.py:81-103, crawlers/availability_crawler.py:16-17,97-124)
with declarative per-host selection:

- each round a host may fetch at most `token_rate` URLs (the reference's
  LISTINGS_NUM_PER_PROXY=50 chunk cap);
- URLs matching a robots disallow prefix are never fetched;
- a host whose consecutive-error counter reaches `ban_threshold` is
  quarantined (the reference's proxy ban at 20 login-redirects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from facebook_crawler_spark.functions.urls import path_of

# Defaults applied to hosts that appear in the frontier but not in the hosts
# dimension (mirrors sim.oracle's HostState defaults — the reference's
# LISTINGS_NUM_PER_PROXY / PROXIES_BANNED_THRESHOLD constants,
# reference config.py:86-87,95-96).
DEFAULT_TOKEN_RATE = 50
DEFAULT_BAN_THRESHOLD = 20


def host_order() -> list:
    """Deterministic crawl order within a host: priority band first (the
    reference's price-band loop), then the persisted shuffle order
    (reference crawlers/scroll_crawler.py:16-19,48,61), url_hash as the
    total-order tiebreak. (Built lazily: Column construction needs an
    active SparkContext.)"""
    return [F.col("priority").asc(), F.col("seed_rank").asc(), F.col("url_hash").asc()]


def robots_filter(frontier: DataFrame, hosts: DataFrame) -> DataFrame:
    """Drop URLs whose path matches any robots disallow prefix of their
    host. Hosts dimension is broadcast — no shuffle of the frontier."""
    joined = frontier.join(
        F.broadcast(hosts.select("host", "robots_disallow")), "host", "left"
    )
    disallowed = F.exists(
        F.coalesce(F.col("robots_disallow"), F.array().cast("array<string>")),
        lambda d: path_of(F.col("canonical_url")).startswith(d),
    )
    return joined.filter(~disallowed).drop("robots_disallow")


def budget_rank(
    pending: DataFrame, host_budgets: DataFrame, default_budget: int | None = None,
    two_stage: bool = True,
) -> DataFrame:
    """Select each host's next `budget` URLs in deterministic crawl order.

    Skew-safe two-stage top-k (SURVEY.md §4 custom #3, R3): a single
    window over `host` would funnel the hot host (40% of a 10^10 frontier)
    through one task. Stage 1 ranks within (host, host_salt) — parallel
    across the hot host's salt shards — and keeps at most `budget` per
    shard, a superset of the true per-host top-k. Stage 2 ranks the
    surviving ≤ budget×salt_factor rows per host — a tiny set — so the
    final per-host order is byte-identical to a direct top-k, without the
    skewed shuffle.

    `two_stage=False` skips stage 1 (one window = one exchange+sort instead
    of two) and is byte-identical by construction — stage 1 only pre-prunes
    a superset of what stage 2 keeps. Callers that KNOW the pending set is
    small (the crawl engine's driver-side pending bound in the politeness-
    bounded steady state) elect the single-window form; the skew-safe
    default stays on everywhere the input may be frontier-scale.

    `default_budget`: budget for hosts absent from `host_budgets` (discovered
    hosts outside the dimension). None (default) keeps the inner-join
    behavior — unknown hosts are dropped. Callers that can see out-of-
    dimension hosts (the crawl engine) pass DEFAULT_TOKEN_RATE so engine and
    simulator schedule them identically; quarantined hosts must then be
    excluded from `pending` BEFORE this call (they are absent from
    host_budgets too and would wrongly inherit the default).
    """
    if default_budget is None:
        p = pending.join(F.broadcast(host_budgets.select("host", "budget")), "host")
    else:
        p = pending.join(
            F.broadcast(host_budgets.select("host", "budget")), "host", "left"
        ).withColumn("budget", F.coalesce(F.col("budget"), F.lit(default_budget)))
    stage1 = p
    if two_stage:
        w1 = Window.partitionBy("host", "host_salt").orderBy(*host_order())
        stage1 = p.withColumn("__r1", F.row_number().over(w1)).filter(
            F.col("__r1") <= F.col("budget")
        )
    w2 = Window.partitionBy("host").orderBy(*host_order())
    out = (
        stage1.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.col("budget"))
        .drop("budget")
    )
    return out.drop("__r1") if two_stage else out


def update_host_state(
    host_state: DataFrame, round_outcomes: DataFrame, ban_threshold_col: str = "ban_threshold"
) -> DataFrame:
    """Functional per-round host-state update (SURVEY.md R5 — recomputed
    from (previous state ⋈ this round's outcomes), no mutable driver
    state, so resume replays identically).

    `round_outcomes` must have one row per (host) with `n_items`,
    `trailing_blocked` (length of the blocked suffix in fetch order) and
    `any_ok`. Consecutive-error semantics match the reference's per-proxy
    counter (availability_crawler.py:97-124): a success resets the count;
    errors at the end of the round carry into the next.

    Hosts present in `round_outcomes` but not in `host_state` (first fetch
    of a discovered out-of-dimension host) enter the state table with the
    same defaults the simulator applies — the full-outer join keeps them.
    """
    joined = host_state.join(round_outcomes, "host", "full")
    prev_consec = F.coalesce(F.col("consecutive_errors"), F.lit(0))
    new_consec = (
        F.when(F.col("n_items").isNull(), prev_consec)  # host idle this round
        .when(
            F.col("trailing_blocked") == F.col("n_items"),
            prev_consec + F.col("trailing_blocked"),  # whole round failed
        )
        .otherwise(F.col("trailing_blocked"))  # a success occurred → count restarts at suffix
    )
    ban = F.coalesce(F.col(ban_threshold_col), F.lit(DEFAULT_BAN_THRESHOLD))
    return joined.select(
        "host",
        F.coalesce(F.col("token_rate"), F.lit(DEFAULT_TOKEN_RATE)).alias("token_rate"),
        ban.alias(ban_threshold_col),
        new_consec.cast("int").alias("consecutive_errors"),
        (new_consec >= ban).alias("quarantined"),
    )
