"""Streaming heavy hitters: bucket-sharded Space-Saving summaries.

The batch operator (operators/heavyhitters.py) finds exact phi-heavy
hitters with Misra-Gries candidates + one recount.  A streaming ingest
needs the same candidate set ONLINE — top frequent keys maintained as
rows arrive, without ever holding the full key cardinality.  This is
Space-Saving (Metwally, Agrawal & El Abbadi 2005, "Efficient
computation of frequent and top-k elements in data streams") as a
Spark stateful operator, built the way the other custom state ops here
are built:

* **State is sharded by key-hash bucket** (the stateful.py:83-99
  argument: applyInPandasWithState pays a Python round trip per state
  group per batch, so the group key is a hash bucket, not the raw
  key).  Each bucket owns an independent Space-Saving summary of
  ``capacity`` counters over ITS shard of the key space.  Because a
  key lives in exactly one bucket, the per-bucket guarantee lifts to
  the global one: a key with global freq >= phi*N has in-bucket freq
  >= phi*N >= phi*N_b, and Space-Saving tracks every key with
  in-bucket freq > N_b/capacity — so ``capacity > 1/phi`` per bucket
  makes the union of bucket summaries a guaranteed candidate superset,
  the same bound as the batch MG fold.
* **Weighted bulk updates.**  Rows fold through value_counts per
  pandas chunk; a tracked key adds its batch weight, an untracked key
  either occupies a free counter or evicts the minimum counter m and
  enters with (est = m + w, err = m) — the textbook overestimate
  invariant ``true <= est <= true + err`` holds per bucket.
* **Snapshots, not deltas.**  Every micro-batch each updated bucket
  emits its full summary tagged with ``n_seen`` (rows folded into the
  bucket so far).  The LAST snapshot per bucket — selectable as
  ``n_seen == max(n_seen) over bucket`` — is the summary at stream
  end; intermediate snapshots are the live monitoring feed (the
  reference's Analytics window report, Analytics.java:39-59, with an
  unbounded key space).

The summary is approximate by design (est overestimates by <= err);
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
    """Maintain per-bucket Space-Saving summaries over a stream.

    Output rows: ``(bucket, key, est, err, n_seen)`` — one snapshot of
    the whole bucket per micro-batch in which the bucket saw rows.
    ``est`` is an overestimate of the key's in-bucket count, ``err``
    its maximum overestimation, ``n_seen`` the bucket's total row
    count at snapshot time (NULL keys are dropped before bucketing,
    matching the batch operator's documented NULL exclusion).
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
    state_schema = "summary binary, n long"

    def fn(
        bucket: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pickle

        if state.exists:
            sb, n_seen = state.get
            summary: dict = pickle.loads(bytes(sb)) if sb else {}
        else:
            summary, n_seen = {}, 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n_seen += len(pdf)
            for val, w in pdf["key"].value_counts().items():
                w = int(w)
                if val in summary:
                    est, err = summary[val]
                    summary[val] = (est + w, err)
                elif len(summary) < capacity:
                    summary[val] = (w, 0)
                else:
                    # evict the minimum counter; enter with its value
                    # as the error floor (ties broken by key for
                    # replay determinism)
                    mkey = min(summary, key=lambda k: (summary[k][0], k))
                    m = summary[mkey][0]
                    del summary[mkey]
                    summary[val] = (m + w, m)
        state.update(
            (pickle.dumps(summary, protocol=pickle.HIGHEST_PROTOCOL), n_seen)
        )
        if touched and summary:
            keys = list(summary.keys())
            yield pd.DataFrame(
                {
                    "bucket": int(bucket[0]),
                    "key": keys,
                    "est": [summary[k][0] for k in keys],
                    "err": [summary[k][1] for k in keys],
                    "n_seen": n_seen,
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
