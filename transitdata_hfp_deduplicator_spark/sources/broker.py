"""Broker source adapters (reference A1: Pulsar consumer, 1..N topics).

No broker or connector jar ships in this environment, so the adapters
split into (a) the ``readStream`` wiring — correct options for the
Kafka source and the StreamNative pulsar-spark connector, which needs
its jar on the classpath — and (b) the COLUMN MAPPING from each
source's output shape to the engine's message envelope, which is plain
column algebra and fully unit-tested against batch frames of the same
shape (tests/test_sources.py).  Everything downstream (canonicalize →
dedup → analytics → sink) is source-agnostic.

CLOSED (probed rounds 5, 7, 8, 9 and 10, unchanged): no ``spark-sql-kafka`` /
``pulsar-spark-connector`` jar under pyspark's ``jars/``, no ivy
cache, no network to fetch one — a live-broker integration run is
impossible in this sandbox, permanently.  The executable analogs
carrying the contracts instead: the socket source below (live
unbounded network ingestion through real micro-batch machinery) and
the registered ``hfp_text`` Python DataSource
(sources/hfp_datasource.py: offset-range replay == broker offsets,
staged-commit sink == ack-after-persist), leaving only the vendor jar
itself unexercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_to_envelope(df: DataFrame) -> DataFrame:
    """Kafka source shape (key, value, timestamp, headers
    array<struct<key,value:binary>>) → engine envelope.  The headers
    carry the schema tag the reference reads from Pulsar properties
    (ITDeduplicatorTest.java:67-68)."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value"),
        F.col("timestamp").alias("event_time"),
        F.map_from_entries(
            F.expr(
                "transform(coalesce(headers, array()),"
                " h -> struct(h.key as key, cast(h.value as string) as value))"
            )
        ).alias("properties"),
    )


def pulsar_to_envelope(df: DataFrame) -> DataFrame:
    """StreamNative pulsar-spark source shape (__key, value,
    __eventTime, __properties) → engine envelope."""
    return df.select(
        F.col("__key").cast("string").alias("key"),
        F.col("value"),
        F.col("__eventTime").alias("event_time"),
        F.col("__properties").alias("properties"),
    )


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str,
) -> DataFrame:
    """Envelope stream from Kafka.  ``subscribePattern`` is the 1:1
    analog of the reference's multi-topic regex subscription
    (environment.conf:10-16)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("includeHeaders", "true")
        .load()
    )
    return kafka_to_envelope(raw)


def socket_line_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Unbounded line stream over TCP via Spark's built-in socket source
    — the one network source that needs no connector jar, so it is the
    executable stand-in for a live broker subscription: a real
    receiver-backed unbounded source driving the same micro-batch /
    incremental-execution machinery a Kafka/Pulsar subscription would
    (the reference's integration test sends the corpus over a live
    Pulsar connection and awaits the deduped output,
    ITDeduplicatorTest.java:64-113; tests/test_sources.py replays
    hfp-5000.txt through this source and asserts the same 4956).
    Single ``value: string`` column, exactly ``spark.read.text``'s
    shape, so ``sources.hfp.parse_lines`` applies unchanged."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )


def pulsar_envelope_stream(
    spark: SparkSession,
    service_url: str,
    admin_url: str,
    topics_pattern: str,
) -> DataFrame:
    """Envelope stream from Pulsar via the StreamNative connector
    (requires its jar on the classpath — absent here; the reference's
    exact source, environment.conf:4-16)."""
    raw = (
        spark.readStream.format("pulsar")
        .option("service.url", service_url)
        .option("admin.url", admin_url)
        .option("topicsPattern", topics_pattern)
        .load()
    )
    return pulsar_to_envelope(raw)
