"""The wired application — the reference's ``Main.java`` analog.

Main.java:12-30 wires: config → Pulsar source → Analytics scheduler →
Deduplicator → blocking message pump.  Here the same graph is one
declarative composition: envelope stream → canonicalize → stateful
dedup-with-metrics → (a) forward uniques to the sink, (b) tumbling
dup-ratio analytics with alert routing.  Both branches hang off one
tagged stream, so the engine reads the source once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.config import DedupConfig
from transitdata_hfp_deduplicator_spark.streaming.analytics import (
    duplicate_alerts,
    stream_dup_stats,
    with_alerts,
)
from transitdata_hfp_deduplicator_spark.streaming.stateful import dedup_tag_stream


def build_dedup_pipeline(
    envelope_stream: DataFrame,
    config: DedupConfig | None = None,
    identity_cols: tuple[str, ...] = ("value",),
    ts_col: str = "event_time",
    canonicalize: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Wire the full reference dataflow over any envelope stream.

    ``canonicalize=True`` inserts the A3 projection before the dedup
    state (Deduplicator.java:69-106): per-row schema-tag dispatch →
    typed protobuf decode → canonical re-encode, raw bytes on any
    failure — and dedups on the canonical column, so two serializations
    of the same typed message collapse online.  Requires the envelope
    ``value``/``properties`` columns; ``identity_cols`` is overridden.

    Returns ``(uniques, stats, dup_alerts)``:
      * ``uniques`` — first-occurrence rows (key/ts/identity preserved),
        ready for a sink (sinks.write_stream_parquet / a broker sink);
      * ``stats`` — per-window primes/duplicates/ratio/avg-delay with
        the alert column (Analytics.java:47-67 + :50-60);
      * ``dup_alerts`` — one alert per duplicate with its delay
        (Analytics.java:69-75) when ``config.alert_on_duplicate``
        (environment.conf:33-34), else ``None``.
    """
    config = config or DedupConfig()
    if canonicalize:
        from transitdata_hfp_deduplicator_spark.sources.envelope import (
            with_envelope_canonical,
        )

        envelope_stream = with_envelope_canonical(envelope_stream)
        identity_cols = ("canonical",)
    # NOTE: the stats branch chains two stateful operators (dedup
    # tagging -> windowed agg), a shape Spark's global-watermark check
    # refuses at query START — start it inside
    # ``streaming.allow_chained_stateful(spark)`` (the check is safe to
    # lift for this composition: see that context manager's docstring).
    # Building the plan here mutates nothing session-wide.
    tagged = dedup_tag_stream(
        envelope_stream,
        list(identity_cols),
        ts_col,
        ttl_ms=config.cache_ttl_ms,
    )
    # The FORWARD branch preserves the whole envelope row — key,
    # eventTime, properties, payload — exactly what the reference
    # re-sends (Deduplicator.java:117-123).  It deliberately does NOT
    # reuse `tagged` (whose Python state round-trips digests only, the
    # cheap shape for metrics): dropDuplicatesWithinWatermark keeps the
    # row path entirely in JVM state.  Each branch is its own sink
    # query either way, so the source is read once per branch, not
    # twice extra.
    from transitdata_hfp_deduplicator_spark.streaming.dedup_stream import (
        stream_dedup,
    )

    uniques = stream_dedup(
        envelope_stream,
        list(identity_cols),
        ts_col,
        ttl=f"{max(config.cache_ttl_ms // 1000, 1)} seconds",
    )
    stats = with_alerts(
        stream_dup_stats(
            tagged.withColumn("ts", F.timestamp_millis(F.col("ts_ms"))),
            ts_col="ts",
            window_duration=config.poll_interval,
        ),
        ratio_threshold=config.duplicate_ratio_threshold,
        alert_on_threshold=config.alert_on_threshold,
    )
    dup_alerts = duplicate_alerts(tagged) if config.alert_on_duplicate else None
    return uniques, stats, dup_alerts


def run_hfp_corpus_pipeline(
    spark: SparkSession,
    corpus_parquet: str,
    config: DedupConfig | None = None,
    on_alerts: Callable[[list, int], None] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end batch-replay run over an HFP corpus parquet (columns
    topic, payload, ts): returns materialized (uniques, stats) — the
    integration-test shape of the full wiring."""
    from transitdata_hfp_deduplicator_spark.streaming import (
        parquet_stream,
        run_to_memory,
    )
    from transitdata_hfp_deduplicator_spark.streaming.runner import (
        allow_chained_stateful,
    )

    stream = parquet_stream(spark, corpus_parquet)
    uniques_s, stats_s, dup_alerts_s = build_dedup_pipeline(
        stream, config, identity_cols=("topic", "payload"), ts_col="ts"
    )
    uniques = run_to_memory(uniques_s, "append")
    # complete mode: a finite replay's last windows never fall behind
    # the watermark, so append would hold them back forever; the stats
    # branch chains two stateful operators, so its START needs the
    # scoped correctness-check lift (restored on exit — session
    # defaults survive the pipeline run)
    with allow_chained_stateful(spark):
        stats = run_to_memory(stats_s, "complete")
    if on_alerts:
        alerts = stats.filter(F.col("alert").isNotNull()).collect()
        if dup_alerts_s is not None:
            alerts.extend(run_to_memory(dup_alerts_s, "append").collect())
        if alerts:
            on_alerts(alerts, 0)
    return uniques, stats
