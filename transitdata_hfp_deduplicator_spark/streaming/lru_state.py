"""Size-bound LRU dedup state — exact A6 semantics
(``Deduplicator.java:36-40``) as a custom stateful operator.

The reference's dedup cache is a Guava size-bound LRU:
``initialCapacity(35000).maximumSize(250000)``.  Its
``application.cacheTTL`` (4 h) is read but NEVER applied — eviction in
the reference is size-LRU only.  Spark's own
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

Why the full-map state load per batch is fine HERE and only here: this
operator's state is size-bounded by construction (that is its entire
point), so ``O(cap / buckets)`` per micro-batch is a constant — unlike
the unbounded-key operators (stateful.py), which touch only the batch's
own keys.

Why ``applyInPandasWithState`` and not ``transformWithStateInPandas``:
the TWS Python runner requires the ``google.protobuf`` package for its
state-server protocol; the GroupState API carries the per-bucket maps
in its state struct with no extra dependency, and the semantics (load
map, mutate, write back) are identical for a size-bounded map.

Time is data time (the batch's ``ts`` column), not wall clock, so
eviction and TTL are deterministic under replay — the reference's
``System.currentTimeMillis()`` (Deduplicator.java:51) made its cache
behavior unreproducible; determinism is a deliberate improvement.
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from transitdata_hfp_deduplicator_spark.operators.dedup import payload_digest

OUT_SCHEMA = (
    "digest string, ts_ms long, is_prime boolean, delay_ms long, hit_no long"
)
# digest -> (first-write ms, last-access ms, hit count), pickled dicts:
# binary state is one C-path dumps/loads per bucket, where the Arrow
# map codec converts per ENTRY through Python objects (measured ~110s
# per batch at 2.5M keys on the sibling operator, stateful.py)
STATE_SCHEMA = "firsts binary, lasts binary, hits binary"


def lru_dedup_stream(
    sdf: DataFrame,
    identity_cols: Sequence[str],
    ts_col: str,
    max_size: int = 250_000,
    ttl_ms: int | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Tag a stream with LRU-dedup verdicts under a hard state cap.

    One output row per input row: digest, ts_ms, is_prime, delay_ms,
    hit_no.

    * miss -> insert, emit prime (``is_prime=true``), evict the
      least-recently-accessed entry if the bucket is at capacity
      (Guava's LRU is access-ordered)
    * hit  -> emit duplicate with ``delay_ms = ts - first_ms``
      (Deduplicator.java:51-57's ``elapsedSinceHit``) and refresh the
      access time
    * TTL  -> a hit older than ``ttl_ms`` since FIRST WRITE is treated
      as a miss (expireAfterWrite — the reference's intended cacheTTL)

    ``max_size`` is the AGGREGATE entry cap (the reference's 250 000),
    sharded over ``buckets`` independent LRUs.  An evicted key's next
    occurrence re-emits as a prime — the reference's at-least-once
    cache-forgetting behavior, reproduced deterministically in event
    time.
    """
    capacity = max(1, max_size // buckets)

    keyed = sdf.select(
        payload_digest(*identity_cols).alias("digest"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
    ).withColumn("bucket", F.pmod(F.xxhash64("digest"), F.lit(buckets)))

    def fn(
        bucket: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pickle

        if state.exists:
            fb, lb, hb = state.get
            firsts = pickle.loads(bytes(fb)) if fb else {}
            lasts = pickle.loads(bytes(lb)) if lb else {}
            hits = pickle.loads(bytes(hb)) if hb else {}
        else:
            firsts, lasts, hits = {}, {}, {}

        # Rebuild access order ONCE per batch (least-recent first, digest
        # tiebreak — the same (last, key) order the old per-insert min()
        # scan used), then keep it current with O(1) OrderedDict moves.
        # digest -> [first_ms, last_ms, hit_count]
        entries: OrderedDict[str, list[int]] = OrderedDict(
            (k, [firsts[k], lasts[k], hits[k]])
            for k in sorted(lasts, key=lambda k: (lasts[k], k))
        )

        out_d: list[str] = []
        out_t: list[int] = []
        out_p: list[bool] = []
        out_delay: list[int | None] = []
        out_hit: list[int] = []
        # Materialize ALL Arrow chunks before sorting: a group larger than
        # arrow.maxRecordsPerBatch arrives as several pandas chunks, and a
        # per-chunk sort would replay rows in nondeterministic cross-chunk
        # order.  State is capacity-bounded, so the concat is bounded too.
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ) if chunks else None
        if pdf is not None:
            # deterministic replay order: event time, digest tiebreak
            pdf = pdf.sort_values(["ts_ms", "digest"], kind="mergesort")
            for d, ts_ms in zip(pdf["digest"].tolist(), pdf["ts_ms"].tolist()):
                ts_ms = int(ts_ms)
                ent = entries.get(d)
                if (
                    ent is not None
                    and ttl_ms is not None
                    and ts_ms - ent[0] > ttl_ms
                ):
                    # expired after write -> treat as miss
                    del entries[d]
                    ent = None
                if ent is None:
                    entries[d] = [ts_ms, ts_ms, 1]
                    if len(entries) > capacity:
                        # evict least-recently-accessed: O(1).  The new key
                        # sits at the ordered tail, so it can never be the
                        # victim (matching the old `k != d` exclusion).
                        entries.popitem(last=False)
                    out_d.append(d)
                    out_t.append(ts_ms)
                    out_p.append(True)
                    out_delay.append(None)
                    out_hit.append(1)
                else:
                    ent[1] = ts_ms
                    ent[2] += 1
                    entries.move_to_end(d)
                    out_d.append(d)
                    out_t.append(ts_ms)
                    out_p.append(False)
                    out_delay.append(ts_ms - ent[0])
                    out_hit.append(ent[2])

        state.update(
            (
                pickle.dumps(
                    {k: e[0] for k, e in entries.items()},
                    protocol=pickle.HIGHEST_PROTOCOL,
                ),
                pickle.dumps(
                    {k: e[1] for k, e in entries.items()},
                    protocol=pickle.HIGHEST_PROTOCOL,
                ),
                pickle.dumps(
                    {k: e[2] for k, e in entries.items()},
                    protocol=pickle.HIGHEST_PROTOCOL,
                ),
            )
        )
        yield pd.DataFrame(
            {
                "digest": pd.Series(out_d, dtype="object"),
                "ts_ms": pd.Series(out_t, dtype="int64"),
                "is_prime": pd.Series(out_p, dtype="bool"),
                "delay_ms": pd.array(out_delay, dtype="Int64"),
                "hit_no": pd.Series(out_hit, dtype="int64"),
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
