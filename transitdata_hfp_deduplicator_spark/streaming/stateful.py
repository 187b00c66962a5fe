"""Custom stateful streaming operator: dedup WITH online duplicate
metrics — the complete reference hot path (Deduplicator.java:43-66) in
one operator.

``dropDuplicatesWithinWatermark`` covers drop-the-duplicate but cannot
report ``elapsedSinceHit`` (the time since the key's first occurrence,
Deduplicator.java:56) for each suppressed message — the number the
analytics side channel averages (Analytics.java:72-75).  This operator
keeps (first_seen, hit_count) per digest in ``applyInPandasWithState``
state and emits EVERY row tagged ``is_prime`` + ``delay_ms``, so the
downstream tumbling aggregation (streaming/analytics.py) computes the
reference's full metric set online.

Scale shape: state is hash-partitioned by digest; per-batch work is
Arrow-batched pandas per key-group; state TTL via event-time timeout =
the watermark-bounded eviction the reference's cacheTTL intended.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from transitdata_hfp_deduplicator_spark.operators.dedup import payload_digest


def dedup_tag_stream(
    stream: DataFrame,
    identity_cols: Sequence[str],
    ts_col: str,
    ttl_ms: int = 4 * 3600 * 1000,
    n_buckets: int = 256,
) -> DataFrame:
    """Tag a stream prime/duplicate with per-duplicate delay, statefully.

    Output schema: key (digest), ts_ms, is_prime, delay_ms, hit_no.
    delay_ms = event-time ms since the key's first occurrence (NULL for
    primes) — ``elapsedSinceHit`` in event time.

    State layout: applyInPandasWithState pays a Python/pandas round
    trip PER STATE GROUP per batch, so grouping by the raw digest makes
    millions of tiny groups (measured 23s for 100k rows).  The state
    key is therefore a HASH BUCKET of the digest; each bucket's state
    is a digest→(first_ms, hits) map.  Per-batch Python overhead drops
    to ``n_buckets`` calls (measured ~10x), parallelism and state-store
    partitioning are preserved (buckets shard across executors), and
    per-key semantics are untouched — the in-bucket dict IS the
    reference's hashCache (Deduplicator.java:37-40), one shard per
    bucket.

    TTL: enforced row-wise in event time (a duplicate more than
    ``ttl_ms`` after its key's first occurrence is a fresh prime);
    expired entries are pruned once the watermark passes their expiry.
    Late-beyond-watermark duplicates may re-emit — the same contract as
    ``dropDuplicatesWithinWatermark`` and the reference's cache
    forgetting.
    """
    keyed = stream.select(
        payload_digest(*identity_cols).alias("key"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        F.col(ts_col).alias("ts"),
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("key"), F.lit(n_buckets))
    ).withWatermark("ts", f"{max(ttl_ms // 1000, 1)} seconds")

    out_schema = (
        "key string, ts_ms long, is_prime boolean, delay_ms long, hit_no long"
    )
    state_schema = "firsts map<string,long>, hits map<string,long>"

    def fn(
        bucket: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        firsts, hits = state.get if state.exists else ({}, {})
        firsts, hits = dict(firsts or {}), dict(hits or {})
        wm = state.getCurrentWatermarkMs()
        out_key, out_ts, out_prime, out_delay, out_hit = [], [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ms", kind="mergesort")
            for k, ts_ms in zip(pdf["key"].tolist(), pdf["ts_ms"].tolist()):
                ts_ms = int(ts_ms)
                first = firsts.get(k)
                # row-wise event-time TTL (state eviction lags the
                # watermark by a batch; semantics must not)
                if first is not None and ts_ms - first > ttl_ms:
                    first = None
                if first is None:
                    firsts[k] = ts_ms
                    hits[k] = 1
                    out_key.append(k)
                    out_ts.append(ts_ms)
                    out_prime.append(True)
                    out_delay.append(None)
                    out_hit.append(1)
                else:
                    hits[k] = hits.get(k, 0) + 1
                    out_key.append(k)
                    out_ts.append(ts_ms)
                    out_prime.append(False)
                    out_delay.append(ts_ms - first)
                    out_hit.append(hits[k])
        # prune entries the watermark has passed (can only suppress rows
        # that would be late anyway)
        if wm > 0:
            expired = [k for k, f in firsts.items() if f + ttl_ms < wm]
            for k in expired:
                firsts.pop(k, None)
                hits.pop(k, None)
        state.update((firsts, hits))
        state.setTimeoutTimestamp(wm + ttl_ms + 1 if wm > 0 else ttl_ms)
        yield pd.DataFrame(
            {
                "key": out_key,
                "ts_ms": out_ts,
                "is_prime": out_prime,
                "delay_ms": pd.array(out_delay, dtype="Int64"),
                "hit_no": out_hit,
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
