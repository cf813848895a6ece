"""Set-algebra invariants (SURVEY.md §5.4) on the synthetic listing fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.operators import setalgebra as sa
from facebook_crawler_spark.sources import synthetic as syn


@pytest.fixture(scope="module")
def pipe(spark):
    snap, scroll = syn.gen_listings(spark, n_snapshot=3000, n_scroll=2000)
    cantons = syn.gen_cantons(spark)
    out = sa.snapshot_pipeline(snap, scroll, cantons, check_cap=400)
    for df in out.values():
        df.cache()
    yield snap.cache(), scroll, out
    for df in out.values():
        df.unpersist()


def ids(df):
    return {r.adId for r in df.select("adId").distinct().collect()}


def test_dedup_is_exact_and_last_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"), ("b", 0, "w")],
        ["adId", "file_seq", "payload"],
    )
    out = {r.adId: r.payload for r in sa.dedup_last_wins(df).collect()}
    assert out == {"a": "y", "b": "w"}


def test_partition_of_scroll(pipe):
    snap, _, out = pipe
    scroll_ids = ids(out["scroll_dedup"])
    assert ids(out["delta"]) | (scroll_ids & ids(snap)) == scroll_ids
    assert ids(out["delta"]).isdisjoint(ids(out["overlap"]))
    # overlap keys = scroll ∩ snapshot
    assert ids(out["overlap"]) == scroll_ids & ids(snap)


def test_partition_of_snapshot(pipe):
    snap, _, out = pipe
    assert ids(out["missing"]) == ids(snap) - ids(out["scroll_dedup"])
    assert ids(out["to_check"]) | ids(out["not_to_check"]) == ids(out["missing"])
    assert ids(out["to_check"]).isdisjoint(ids(out["not_to_check"]))
    assert out["to_check"].count() == min(400, out["missing"].count())


def test_to_check_is_oldest(pipe):
    _, _, out = pipe
    max_checked = out["to_check"].agg(F.max("last_check")).first()[0]
    min_rest = out["not_to_check"].agg(F.min("last_check")).first()[0]
    assert max_checked <= min_rest


def test_snapshot_identity(pipe):
    _, _, out = pipe
    # |snapshot_T0| = |delta| + |to_check| + |overlap| + |not_to_check|
    total = sum(out[k].count() for k in ("delta", "to_check", "overlap", "not_to_check"))
    assert out["snapshot_t0"].count() == total
    assert ids(out["snapshot_t0"]) == (
        ids(out["delta"]) | ids(out["to_check"]) | ids(out["overlap"]) | ids(out["not_to_check"])
    )


def test_swiss_filter(pipe):
    _, _, out = pipe
    bad = out["scroll_dedup"].filter(F.col("cantonCode").startswith("X")).count()
    assert bad == 0
