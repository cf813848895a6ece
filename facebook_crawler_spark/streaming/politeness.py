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


def budget_rank(pending: DataFrame, host_budgets: DataFrame) -> DataFrame:
    """Select each host's next `budget` URLs in deterministic crawl order.

    Skew-safe two-stage top-k (SURVEY.md §4 custom #3, R3): a single
    window over `host` would funnel the hot host (40% of a 10^10 frontier)
    through one task. Stage 1 ranks within (host, host_salt) — parallel
    across the hot host's salt shards — and keeps at most `budget` per
    shard, a superset of the true per-host top-k. Stage 2 ranks the
    surviving ≤ budget×salt_factor rows per host — a tiny set — so the
    final per-host order is byte-identical to a direct top-k, without the
    skewed shuffle.
    """
    p = pending.join(F.broadcast(host_budgets.select("host", "budget")), "host")
    w1 = Window.partitionBy("host", "host_salt").orderBy(*host_order())
    stage1 = p.withColumn("__r1", F.row_number().over(w1)).filter(
        F.col("__r1") <= F.col("budget")
    )
    w2 = Window.partitionBy("host").orderBy(*host_order())
    return (
        stage1.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.col("budget"))
        .drop("__r1", "budget")
    )


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
    """
    joined = host_state.join(round_outcomes, "host", "left")
    new_consec = (
        F.when(F.col("n_items").isNull(), F.col("consecutive_errors"))  # host idle this round
        .when(
            F.col("trailing_blocked") == F.col("n_items"),
            F.col("consecutive_errors") + F.col("trailing_blocked"),  # whole round failed
        )
        .otherwise(F.col("trailing_blocked"))  # a success occurred → count restarts at suffix
    )
    return joined.select(
        "host",
        "token_rate",
        F.col(ban_threshold_col),
        new_consec.cast("int").alias("consecutive_errors"),
        (new_consec >= F.col(ban_threshold_col)).alias("quarantined"),
    )
