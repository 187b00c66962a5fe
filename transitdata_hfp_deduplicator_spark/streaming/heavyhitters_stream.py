"""Streaming heavy hitters: bucket-sharded frequent-items summaries.

The batch operator (operators/heavyhitters.py) finds exact phi-heavy
hitters with Misra-Gries candidates + one recount.  A streaming ingest
needs the same candidate set ONLINE — top frequent keys maintained as
rows arrive, without ever holding the full key cardinality.  This
operator maintains the same weighted Misra-Gries summary as the batch
fold, reported in Space-Saving (est, err) form — the two summaries are
isomorphic (Agarwal et al. 2013, "Mergeable Summaries" §3: an MG
counter c(x) with cumulative decrement total D gives the SS-style
bounds ``true <= c(x) + D <= true + D``) — built the way the other
custom state ops here are built:

* **State is sharded by key-hash bucket** (the stateful.py:83-99
  argument: applyInPandasWithState pays a Python round trip per state
  group per batch, so the group key is a hash bucket, not the raw
  key).  Each bucket owns an independent summary of ``capacity``
  counters plus its decrement total D over ITS shard of the key space.
  Because a key lives in exactly one bucket, the per-bucket guarantee
  lifts to the global one: a key with global freq >= phi*N has
  in-bucket freq >= phi*N >= phi*N_b, and MG keeps every key with
  in-bucket freq > N_b/(capacity+1) — so ``capacity >= 1/phi`` per
  bucket makes the union of bucket summaries a guaranteed candidate
  superset, the same bound as the batch fold.
* **Bulk updates, never per-key scans.**  Rows fold through
  value_counts per pandas chunk, then ONE weighted MG decrement
  (subtract the (capacity+1)-th largest counter from all, drop
  non-positive) — O((distinct_chunk + capacity) log) per chunk.  A
  sequential Space-Saving loop pays an O(capacity) min-scan per
  UNTRACKED key, which measured 0.02M rows/s against this
  formulation's multi-M rows/s on a singleton-flood stream
  (tools/stress_heavyhitters_stream.py).
* **Snapshots, not deltas.**  Every micro-batch each updated bucket
  emits its full summary — ``est = counter + D`` (overestimate),
  ``err = D`` (its maximum overestimation) — tagged with ``n_seen``
  (rows folded into the bucket so far).  The LAST snapshot per bucket,
  selectable as ``n_seen == max(n_seen) over bucket``, is the summary
  at stream end; intermediate snapshots are the live monitoring feed
  (the reference's Analytics window report, Analytics.java:39-59, with
  an unbounded key space).

The summary is approximate by design (``true <= est <= true + err``);
for EXACT phi-heavy hitters, recount the candidate union against the
corpus exactly like the batch operator's phase 2 — queries.
q_heavy_hitters_stream does precisely that, which makes the streaming
path hash-checkable against the same GROUP BY + HAVING oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def space_saving_stream(
    stream: DataFrame,
    key_col: str,
    capacity: int,
    n_buckets: int = 8,
) -> DataFrame:
    """Maintain per-bucket frequent-items summaries over a stream
    (weighted Misra-Gries state, Space-Saving-style (est, err) output).

    Output rows: ``(bucket, key, est, err, n_seen)`` — one snapshot of
    the whole bucket per micro-batch in which the bucket saw rows.
    ``est`` is an overestimate of the key's in-bucket count, ``err``
    its maximum overestimation, ``n_seen`` the bucket's total row
    count at snapshot time (NULL keys are dropped before bucketing,
    matching the batch operator's documented NULL exclusion).  A batch
    whose decrement empties the whole summary (every counter tied at
    the pivot) emits one NULL-key sentinel row ``(bucket, NULL, 0, D,
    n_seen)`` so the bucket's final decrement total stays visible to
    ``final_snapshots`` — tracked keys never have a NULL key, so
    consumers that only want real candidates filter ``key IS NOT
    NULL``.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    keyed = (
        stream.select(F.col(key_col).cast("string").alias("key"))
        .filter(F.col("key").isNotNull())
        .withColumn("bucket", F.pmod(F.xxhash64("key"), F.lit(n_buckets)))
    )
    out_schema = "bucket long, key string, est long, err long, n_seen long"
    # pickled dict per bucket (the stateful.py binary-state argument:
    # one C-path pickle per bucket beats per-entry Arrow map codecs)
    state_schema = "counts binary, d long, n long"

    def fn(
        bucket: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pickle

        if state.exists:
            cb, dec, n_seen = state.get
            counts: dict = pickle.loads(bytes(cb)) if cb else {}
        else:
            counts, dec, n_seen = {}, 0, 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n_seen += len(pdf)
            for val, c in pdf["key"].value_counts().items():
                counts[val] = counts.get(val, 0) + int(c)
            if len(counts) > capacity:
                # the batch fold's weighted MG decrement
                # (operators/heavyhitters.py): one O(n log n) pass per
                # chunk, never per key
                vals = sorted(counts.values(), reverse=True)
                d = vals[capacity]
                dec += d
                counts = {k: v - d for k, v in counts.items() if v > d}
        state.update(
            (
                pickle.dumps(counts, protocol=pickle.HIGHEST_PROTOCOL),
                dec,
                n_seen,
            )
        )
        if touched and counts:
            keys = list(counts.keys())
            yield pd.DataFrame(
                {
                    "bucket": int(bucket[0]),
                    "key": keys,
                    "est": [counts[k] + dec for k in keys],
                    "err": dec,
                    "n_seen": n_seen,
                }
            )
        elif touched:
            # An all-ties decrement emptied the summary.  Still emit the
            # bucket's state as a NULL-key sentinel carrying the FINAL
            # decrement total D: without it the last visible snapshot
            # would be an older one with a smaller D, and any consumer
            # bounding unreported keys by max(err) (guaranteed_top_k)
            # would under-estimate the ceiling — an unsound guarantee.
            yield pd.DataFrame(
                {
                    "bucket": [int(bucket[0])],
                    "key": [None],
                    "est": [0],
                    "err": [dec],
                    "n_seen": [n_seen],
                }
            )

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_snapshots(snapshots: DataFrame) -> DataFrame:
    """Reduce the appended snapshot stream output to each bucket's LAST
    summary (rows where n_seen equals the bucket's max)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("bucket")
    return (
        snapshots.withColumn("mx", F.max("n_seen").over(w))
        .filter(F.col("n_seen") == F.col("mx"))
        .drop("mx")
    )


def guaranteed_top_k(snapshots: DataFrame, k: int) -> DataFrame:
    """Top-k keys by estimated count, each tagged with whether its
    TRUE-top-k membership is guaranteed (Metwally et al. 2005 §4's
    top-k report, lifted to the bucket-sharded summary).

    A key outside the reported set has true count at most
    ``max(est_(k+1), max_b D_b)``: a TRACKED key's true count is
    bounded by its est (<= the (k+1)-th largest), and an UNTRACKED
    key's by its bucket's decrement total D (it was absorbed entirely
    by decrements), hence by the max D over buckets.  A reported key
    whose lower bound ``est - err`` clears that ceiling is therefore
    in the true top-k under ANY data consistent with the summary.

    Tie boundary (explicit contract): the test is ``est - err >=
    ceil``, so when an unreported key can TIE the ceiling exactly
    (true count == ceil == est - err), ``guaranteed=True`` asserts
    membership in SOME valid top-k — the reported key is never
    strictly below rank k, and the tie is resolvable in its favor.
    The strict variant ``est - err > ceil`` would assert membership
    in EVERY top-k.  ``>=`` matches the published Space-Saving
    report semantics and the batch twin; pinned by
    tests/test_heavyhitters_stream.py's exact-tie case.

    Output: ``(key, est, err, guaranteed)``, highest est first.  The
    single-partition rank window is over the summary only —
    <= n_buckets * capacity rows by construction, the same
    bounded-small contract as the batch operator's candidate set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window as W

    fin = final_snapshots(snapshots).select("key", "est", "err")
    # rank only real tracked keys; NULL-key sentinel rows (emitted when
    # a decrement empties a bucket's summary) carry no candidate but DO
    # carry that bucket's final D, so they participate in the ceiling
    ranked = fin.filter(F.col("key").isNotNull()).withColumn(
        "rnk", F.row_number().over(W.orderBy(F.col("est").desc(), F.col("key")))
    )
    # ceiling on any unreported key's true count: the (k+1)-th est if a
    # tracked key remains (0 when the summary holds <= k keys), or the
    # worst bucket's decrement total for keys the summary dropped —
    # max(err) taken over ALL final rows including sentinels, so a
    # bucket whose last batch wiped its summary still contributes its
    # full D
    ceil_ = (
        ranked.agg(
            F.coalesce(
                F.max(F.when(F.col("rnk") == k + 1, F.col("est"))), F.lit(0)
            ).alias("c_tracked")
        )
        .crossJoin(
            fin.agg(F.coalesce(F.max("err"), F.lit(0)).alias("c_dropped"))
        )
        .select(F.greatest("c_tracked", "c_dropped").alias("ceil"))
    )
    return (
        ranked.filter(F.col("rnk") <= k)
        .crossJoin(F.broadcast(ceil_))
        .select(
            "key",
            "est",
            "err",
            ((F.col("est") - F.col("err")) >= F.col("ceil")).alias(
                "guaranteed"
            ),
        )
        .orderBy(F.col("est").desc(), F.col("key"))
    )
