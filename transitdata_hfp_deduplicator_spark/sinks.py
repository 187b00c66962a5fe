"""Sinks — the write side of the engine (reference A7/A8).

The reference forwards unique messages to an output Pulsar topic with
async fire-and-forget sends and ack-after-send-initiated, i.e.
at-least-once with silent drop on send failure (Deduplicator.java:
108-129).  Spark's write side is strictly stronger and these helpers
package the idiomatic patterns:

* ``write_stream_parquet`` — checkpointed streaming append: exactly-once
  into an idempotent file sink (checkpoint tracks committed batches).
* ``alert_sink`` — the reference's alert channel (Analytics.java:50-60)
  as a ``foreachBatch`` consumer: per-batch alert rows are handed to a
  callback (log/pager/topic producer) with the batch id for idempotent
  delivery.
* ``envelope_to_kafka_columns`` — maps the engine's message envelope
  back to the Kafka/Pulsar sink column contract (key/value/headers), so
  a broker sink is one ``.format("kafka")`` away; no broker ships in
  this environment, so the format call itself stays with the caller.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.streaming.runner import ephemeral_dir
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Checkpointed streaming parquet append (exactly-once: the
    checkpoint records committed epochs; replays after failure rewrite
    the same files)."""
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option(
            "checkpointLocation",
            checkpoint or ephemeral_dir("sink_ckpt_"),
        )
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def alert_sink(
    stats_stream: DataFrame,
    on_alerts: Callable[[list, int], None],
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Route alert rows (streaming/analytics.with_alerts output) to a
    callback per micro-batch — the Spark shape of the reference's
    logger.error alert channel. The callback receives (rows, batch_id);
    batch_id makes downstream delivery idempotent under replays."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        alerts = batch_df.filter(F.col("alert").isNotNull()).collect()
        if alerts:
            on_alerts(alerts, batch_id)

    return (
        stats_stream.writeStream.foreachBatch(handle)
        .option(
            "checkpointLocation",
            checkpoint or ephemeral_dir("alert_ckpt_"),
        )
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a BUCKETED parquet table: rows are hash-partitioned
    into ``n_buckets`` files per write task by ``bucket_cols`` and the
    layout is recorded in the catalog, so any later equi-join or
    aggregation on the bucket key plans WITHOUT an Exchange on this
    side — the co-located-join layout for 100 TB fact tables (shuffle
    the table once at write time, never again at read time).

    The reference has no storage layer at all (its only persistence
    idea is "hashes could later live in Redis", Deduplicator.java:27);
    this is the Spark-native answer to the same externalize-the-index
    need: the DIGEST-bucketed dedup index joins against new batches
    with zero index-side shuffle (see q_dedup_incremental for the
    anti-join shape).

    ``sort_cols`` additionally sorts within each bucket file so
    bucket-key joins skip the Sort as well (SortMergeJoin reads
    pre-sorted runs).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def envelope_to_kafka_columns(df: DataFrame) -> DataFrame:
    """Envelope (key, value, event_time, properties) → Kafka sink
    columns: key/value binary + headers array<struct<key,value>>.
    The reference preserves exactly these fields on forward
    (Deduplicator.java:117-123)."""
    return df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.expr(
            "transform(map_entries(properties),"
            " e -> struct(e.key as key, cast(e.value as binary) as value))"
        ).alias("headers"),
    )
