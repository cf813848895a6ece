"""Structured Streaming: windowed aggregation parity vs batch, foreachBatch
commits, stateful sessionization."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.sources.tables import Table
from facebook_crawler_spark.streaming import structured as ss


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # split the events table into several files so availableNow produces
    # multiple micro-batches; range-partition by ts so files arrive in
    # event-time order (otherwise the watermark legitimately drops the
    # out-of-order tail and stream ≠ batch by design)
    d = str(tmp_path_factory.mktemp("events_stream"))
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartitionByRange(6, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def test_stream_matches_batch_aggregation(spark, events_dir, tmp_path):
    stream = ss.read_event_stream(spark, events_dir, max_files=2)
    # watermark wider than the data's 30-day span: micro-batch file order is
    # not guaranteed, so any smaller lateness bound drops rows the batch
    # query counts (correct streaming semantics, but not what this parity
    # test is checking)
    agg = ss.stream_windowed_counts(stream, window="1 hour", late="60 days")
    out = Table(str(tmp_path / "agg"))
    ss.run_stream_to_table(agg, out, str(tmp_path / "ckpt"))

    got = out.read(spark)
    # update-mode emits upserts per batch — last batch per key wins
    from pyspark.sql import Window

    w = Window.partitionBy("win_start", "event_type").orderBy(F.col("batch_id").desc())
    final = (
        got.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .select("win_start", "event_type", "n", "sum_value")
    )

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )
    got_set = {tuple(r) for r in final.collect()}
    exp_set = {tuple(r) for r in batch.collect()}
    assert got_set == exp_set


def test_stateful_sessionize(spark, events_dir, tmp_path):
    stream = ss.read_event_stream(spark, events_dir, max_files=3)
    sessions = ss.sessionize_stateful(stream)
    out = Table(str(tmp_path / "sessions"))
    ss.run_stream_to_table(sessions, out, str(tmp_path / "ckpt2"))

    got = out.read(spark)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc(), F.col("n_events").desc())
    final = got.withColumn("rn", F.row_number().over(w)).filter("rn = 1")

    batch = spark.read.parquet(events_dir).groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )
    j = final.alias("s").join(batch.alias("b"), "user_id")
    mismatch = j.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.total_value") - F.col("b.total_value")) > 1e-6)
    ).count()
    assert mismatch == 0
    assert final.count() == batch.count()
