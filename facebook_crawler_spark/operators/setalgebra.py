"""Snapshot set-algebra — the reference's analytic core (SURVEY.md §2.3).

The reference diffs yesterday's snapshot against today's scroll results with
in-memory dicts (reference data_processing/data_processor.py:97-144). Here
every step is a declarative DataFrame op, so Catalyst plans broadcast/shuffle
joins and AQE handles skew; nothing materializes on the driver.

Semantics reproduced exactly:
- dedup last-wins by adId across per-city files (data_processor.py:44-50)
- Swiss-canton membership filter (data_processor.py:88-92)
- delta   = scroll ∖ snapshot  (data_processor.py:117-122)
- overlap = snapshot ∩ scroll, keeping snapshot payload (data_processor.py:124-130)
- missing = snapshot ∖ scroll  (data_processor.py:99-100)
- to_check/not_to_check: oldest-`last_check` K of missing (data_processor.py:102-106)
- snapshot_T0 = delta ∪ checked ∪ overlap ∪ not_to_check (data_processor.py:132-135)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_last_wins(df: DataFrame, key: str = "adId", order: str = "file_seq") -> DataFrame:
    """Keep the row with the greatest `order` per `key` (later file wins).

    Reference: dict insert keyed by adId over files in sequence
    (data_processor.py:44-50). One shuffle on `key`; the window's sort is
    per-key and partial-agg friendly. Rows tied on (key, order) — which the
    reference's sequential dict insert disambiguates by file row order, an
    order Spark does not preserve — get a deterministic representative via
    a whole-row hash tiebreak, so repeated runs (and resume replays) always
    pick the same row.
    """
    tiebreak = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(key).orderBy(F.col(order).desc(), tiebreak.desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def filter_member(df: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Membership semi-join vs a small dimension (data_processor.py:88-92).

    The dimension is broadcast: no shuffle of the fact side.
    """
    return df.join(F.broadcast(dim.select(key).distinct()), key, "left_semi")


def filter_not_member(df: DataFrame, other: DataFrame, key: str) -> DataFrame:
    """Anti membership vs another set of keys (data_processor.py:83-89)."""
    return df.join(other.select(key).distinct(), key, "left_anti")


def delta(scroll: DataFrame, snapshot: DataFrame, key: str = "adId") -> DataFrame:
    """New listings: scroll rows absent from the snapshot (J1)."""
    return scroll.join(snapshot.select(key), key, "left_anti")


def overlap(snapshot: DataFrame, scroll: DataFrame, key: str = "adId") -> DataFrame:
    """Rows seen both days; snapshot payload is kept, like the reference's
    `{k: snapshot[k] for k in overlap_ids}` (J3)."""
    return snapshot.join(scroll.select(key), key, "left_semi")


def missing(snapshot: DataFrame, scroll: DataFrame, key: str = "adId") -> DataFrame:
    """Snapshot rows absent from today's scroll — availability-check
    candidates (J2)."""
    return snapshot.join(scroll.select(key), key, "left_anti")


def topk_split(df: DataFrame, order: str, k: int, key: str = "adId") -> tuple[DataFrame, DataFrame]:
    """(head, tail): the K oldest rows by `order` vs the rest (T1).

    The reference sorts the whole list and slices
    (data_processor.py:102-106). A global row_number window would funnel
    every row through one partition; instead the head is ORDER BY + LIMIT —
    Catalyst plans TakeOrderedAndProject (per-partition top-k, then a k-row
    merge on the driver, scale-safe for k≪N) — and the tail is an anti-join
    against the head's keys. Ties at the boundary are broken by `key` so the
    split is deterministic.
    """
    head = df.orderBy(F.col(order).asc_nulls_last(), F.col(key)).limit(k)
    tail = df.join(head.select(key), key, "left_anti")
    return head, tail


def merge_snapshot(*parts: DataFrame) -> DataFrame:
    """Union the day's parts into the new snapshot (J5),
    tolerant of schema drift between stages like the reference's
    heterogeneous dict lists (data_processor.py:132-135)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def snapshot_pipeline(
    snapshot_t1: DataFrame,
    scroll_t0: DataFrame,
    cantons: DataFrame,
    check_cap: int = 8000,
    round_ts=None,
) -> dict[str, DataFrame]:
    """Full stage-2+5 pipeline (reference main.py:24-43) as one plan set.

    Returns all intermediate sets plus the merged snapshot; counts for the
    metrics channel come from `df.observe`/count at the call site.
    """
    scroll = dedup_last_wins(scroll_t0)
    scroll = filter_member(scroll, cantons, "cantonCode")
    d = delta(scroll, snapshot_t1)
    ov = overlap(snapshot_t1, scroll)
    miss = missing(snapshot_t1, scroll)
    to_check, not_to_check = topk_split(miss, "last_check", check_cap)
    if round_ts is not None:
        # constant-column stamping (P7/P8, data_processor.py:63-66)
        ov = ov.withColumn("crawlDatetime", F.lit(round_ts).cast("timestamp"))
        to_check = to_check.withColumn("last_check", F.lit(round_ts).cast("timestamp"))
    snap_t0 = merge_snapshot(d, to_check, ov, not_to_check)
    return {
        "scroll_dedup": scroll,
        "delta": d,
        "overlap": ov,
        "missing": miss,
        "to_check": to_check,
        "not_to_check": not_to_check,
        "snapshot_t0": snap_t0,
    }
