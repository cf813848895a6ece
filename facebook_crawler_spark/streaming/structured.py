"""Structured Streaming surface (SURVEY.md §2.8).

The reference is a batch job with streaming-shaped semantics; the engine's
crawl rounds are processing-time micro-batches driven by `round_runner`.
This module is the lift of that model into real Structured Streaming, for
pipelines that want a live feed instead of a driver loop:

- `stream_windowed_counts`: file-source stream → watermark → tumbling
  event-time window aggregation (the late-data-tolerant analog of the
  reference's per-(city, price) counts, scroll_crawler.py:133,162-163);
- `run_stream_to_table`: foreachBatch sink into a ledgered Table — each
  micro-batch is one ACID commit, mirroring the crawl round barrier;
- `sessionize_stateful`: applyInPandasWithState custom stateful operator
  (per-user session aggregation with processing-time timeout) — the
  pattern a custom frontier-state stream would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def read_event_stream(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    """File-source stream over a directory of parquet event files. The
    explicit schema keeps the stream planner from scanning for inference;
    maxFilesPerTrigger bounds micro-batch size (backpressure)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_windowed_counts(events: DataFrame, window: str = "1 hour", late: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window counts with a watermark: late rows beyond
    `late` are dropped and window state is evicted — bounded state at any
    input scale."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def run_stream_to_table(stream_df: DataFrame, table, checkpoint_dir: str) -> None:
    """Drain the stream with availableNow, committing each micro-batch to a
    ledgered Table (ACID append per batch = the crawl-round barrier)."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df.withColumn("batch_id", F.lit(batch_id)))

    q = (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    q.awaitTermination()


SESSION_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_seen timestamp"
_STATE_SCHEMA = "n bigint, total double, last long"


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user session aggregates kept in
    GroupState across micro-batches (applyInPandasWithState) — the engine
    pattern for any cross-batch mutable state a stream needs (the
    reference's per-proxy ban counters are this shape,
    availability_crawler.py:16-17).

    NoTimeout: state eviction-by-idle belongs to continuously-triggered
    deployments (ProcessingTimeTimeout deadlocks an availableNow drain in
    this Spark build — the query never terminates waiting on timers)."""
    import pandas as pd  # noqa: PLC0415

    def update(key, pdfs, state: GroupState):
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, total, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total],
             "last_seen": [pd.Timestamp(last, unit="us")]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
