"""Size-bound LRU dedup state — exact A6 semantics on
``transformWithStateInPandas`` (Spark 4.x arbitrary-state API).

The reference's dedup cache is a Guava size-bound LRU:
``initialCapacity(35000).maximumSize(250000)`` (Deduplicator.java:36-40).
Its ``application.cacheTTL`` (4 h) is read but NEVER applied — eviction
in the reference is size-LRU only.  Spark's own
``dropDuplicatesWithinWatermark`` gives the *intended* TTL semantics
(streaming/dedup_stream.py) but has no size bound at all; this operator
supplies the missing half: a hard entry cap with least-recently-USED
eviction, plus an optional expire-after-write TTL (the config the
reference meant to honor).

Distribution model: a single global LRU is inherently sequential, so
capacity is sharded — ``buckets`` state groups, each an independent LRU
of ``max_size // buckets`` entries (the same trick every distributed
cache uses).  Aggregate memory is bounded identically; eviction order
differs from a global LRU only under per-bucket skew.

Why the full-map load per batch is fine HERE and only here: this
operator's state is size-bounded by construction (that is its entire
point), so ``O(cap / buckets)`` per micro-batch is a constant —
unlike the unbounded-key operators (stateful.py), which touch only the
batch's own keys.

Time is data time (the batch's ``ts`` column), not wall clock, so
eviction and TTL are deterministic under replay — the reference's
``System.currentTimeMillis()`` (Deduplicator.java:51) made its cache
behavior unreproducible; determinism is a deliberate improvement.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from transitdata_hfp_deduplicator_spark.operators.dedup import payload_digest

OUTPUT_SCHEMA = (
    "digest string, ts_ms long, is_prime boolean, delay_ms long, hit_no long"
)


class LruDedupProcessor(StatefulProcessor):
    """Per-bucket LRU cache: digest -> (first_ms, last_ms, hits).

    * miss  -> insert, emit prime (``is_prime=true``), evict LRU if full
    * hit   -> emit duplicate with ``delay_ms = ts - first_ms``
      (Deduplicator.java:51-57's ``elapsedSinceHit``) and bump the
      access time (Guava's LRU is access-ordered)
    * TTL   -> a hit older than ``ttl_ms`` since FIRST WRITE is treated
      as a miss (expireAfterWrite — the reference's intended cacheTTL)
    """

    def __init__(self, capacity: int, ttl_ms: int | None):
        self.capacity = capacity
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.cache = handle.getMapState(
            "cache", "digest string", "first_ms long, last_ms long, hits long"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        # deterministic replay order: event time, digest tiebreak
        pdf = pdf.sort_values(["ts_ms", "digest"], kind="mergesort")

        entries: dict[str, list[int]] = {
            k[0]: [v[0], v[1], v[2]] for k, v in self.cache.iterator()
        }
        before = {k: tuple(v) for k, v in entries.items()}

        out_d, out_t, out_p, out_delay, out_hit = [], [], [], [], []
        for d, ts_ms in zip(pdf["digest"].tolist(), pdf["ts_ms"].tolist()):
            ts_ms = int(ts_ms)
            ent = entries.get(d)
            if ent is not None and self.ttl_ms is not None and (
                ts_ms - ent[0] > self.ttl_ms
            ):
                del entries[d]  # expired after write -> treat as miss
                ent = None
            if ent is None:
                entries[d] = [ts_ms, ts_ms, 1]
                if len(entries) > self.capacity:
                    # evict least-recently-accessed (digest tiebreak)
                    lru = min(
                        (k for k in entries if k != d),
                        key=lambda k: (entries[k][1], k),
                    )
                    del entries[lru]
                out_d.append(d)
                out_t.append(ts_ms)
                out_p.append(True)
                out_delay.append(None)
                out_hit.append(1)
            else:
                ent[1] = ts_ms
                ent[2] += 1
                out_d.append(d)
                out_t.append(ts_ms)
                out_p.append(False)
                out_delay.append(ts_ms - ent[0])
                out_hit.append(ent[2])

        # diff-based state writeback
        for k in before:
            if k not in entries:
                self.cache.removeKey((k,))
        for k, v in entries.items():
            if before.get(k) != tuple(v):
                self.cache.updateValue((k,), tuple(v))

        yield pd.DataFrame(
            {
                "digest": out_d,
                "ts_ms": out_t,
                "is_prime": out_p,
                "delay_ms": pd.array(out_delay, dtype="Int64"),
                "hit_no": out_hit,
            }
        )

    def close(self) -> None:
        pass


def lru_dedup_stream(
    sdf: DataFrame,
    identity_cols: Sequence[str],
    ts_col: str,
    max_size: int = 250_000,
    ttl: int | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Tag a stream with LRU-dedup verdicts under a hard state cap.

    Returns one row per input row: digest, ts_ms, is_prime, delay_ms,
    hit_no.  ``max_size`` is the AGGREGATE entry cap (the reference's
    250 000), sharded over ``buckets`` independent LRUs; ``ttl`` is
    expire-after-write in milliseconds (None = pure size-LRU, the
    reference's actual behavior).

    Requires the RocksDB state-store provider (the
    transformWithState backend); callers set
    ``spark.sql.streaming.stateStore.providerClass`` before starting.
    """
    digest = payload_digest(*identity_cols)
    keyed = sdf.select(
        digest.alias("digest"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        F.pmod(F.xxhash64(digest), F.lit(buckets)).alias("bucket"),
    )
    proc = LruDedupProcessor(max(1, max_size // buckets), ttl)
    return keyed.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
