"""Stateful streaming deduplication — the reference's core operator
(A5+A6), expressed on Spark's state store.

Reference (Deduplicator.java:43-66): per message, digest the canonical
payload, probe an in-heap cache, first occurrence wins.  Eviction was
*intended* to be a 4h TTL (`application.cacheTTL`, environment.conf:24)
but the code never applies it — state is bounded only by a 250k LRU cap
(Deduplicator.java:36-40).  The Spark mapping implements the INTENDED
semantics: the event-time watermark is the TTL, so dedup state is
dropped exactly ``delay`` after the stream's clock passes it —
a deliberate, documented behavior upgrade (SURVEY.md §2 A6, §7 step 5).

Scale: state is hash-partitioned by the digest across executors; a
fixed-width 256-bit digest keeps state-store keys small no matter how
wide the identity columns are (same motive as the reference's
murmur3_128).  RocksDB state store spills to disk; watermark bounds
total state — the two things the reference's hard 250k cap could not
give (it silently forgets and re-emits).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.dedup import payload_digest


def stream_dedup(
    stream: DataFrame,
    identity_cols: Sequence[str],
    ts_col: str,
    ttl: str = "4 hours",
) -> DataFrame:
    """First-occurrence-wins streaming dedup with TTL-bounded state.

    ``dropDuplicatesWithinWatermark`` (Spark 3.5+) keeps a digest in the
    state store and drops any duplicate arriving within the watermark
    delay of the first occurrence — the reference's cacheTTL semantics.
    Exactly-once into idempotent sinks via checkpointing — strictly
    stronger than the reference's at-least-once ack-after-async-send
    (Deduplicator.java:52,59).
    """
    keyed = stream.withColumn("__dedup_key", payload_digest(*identity_cols))
    return (
        keyed.withWatermark(ts_col, ttl)
        .dropDuplicatesWithinWatermark(["__dedup_key"])
        .drop("__dedup_key")
    )
