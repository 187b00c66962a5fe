"""Streaming NEAR-duplicate detection: an online MinHash-LSH index as a
stateful operator.

The reference deduplicates a stream on exact payload equality
(Deduplicator.java:43-66: hash -> cache lookup -> drop/forward).  A
training-data ingest needs the same online shape for *near*-duplicates:
as documents stream in, each is checked against everything seen so far
and tagged, without ever re-scanning the corpus.  This operator is that
check, built the way a 100 TB streaming LSH index has to be:

* **Signatures are map-only.**  Each row computes its own MinHash
  signature with per-row higher-order functions (no groupBy — a
  streaming aggregation would force a second stateful operator before
  the index).  The hash family is the same md5 Kirsch-Mitzenmacher
  construction as the batch operator (operators/similarity.py:278), so
  stream and batch candidacy agree bit-for-bit and the whole pipeline
  is oracle-checkable in any engine.
* **State is the LSH index itself, sharded by band bucket.**  A doc
  explodes into ``bands`` (band, row-values) keys; the state key is a
  hash BUCKET of the band key (same bucketing argument as
  streaming/stateful.py:83-99: per-state-group Python overhead is paid
  per bucket, not per band value), and each bucket's state is a
  band-key -> (first_doc, first_ts, signature) dict — first-wins, like
  the reference's hashCache.
* **Eviction is watermark TTL.**  Entries whose first occurrence has
  fallen ``ttl_ms`` behind the watermark are pruned and the state group
  times out with it — the reference's cacheTTL in event time.

A doc that lands in an occupied bucket is emitted as a HIT against the
bucket's first doc, with ``est_sim`` = fraction of agreeing signature
components (the standard unbiased Jaccard estimate).  Consumers filter
``est_sim >= threshold`` and aggregate hits per doc (see
queries.q_dedup_stream_neardup) — kept out of the operator so the
S-curve cut is a query-side choice, not baked into state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from transitdata_hfp_deduplicator_spark.functions import text as TXT


def rowwise_md5_hexes(
    text_col: Column | str,
    shingle_n: int = 3,
) -> Column:
    """Per-shingle md5 hex array — ONE interpreted transform pass.

    Must be materialized in a projection of its own and REFERENCED (not
    inlined) by both half-extractors below: higher-order functions are
    CodegenFallback, and any single projection that embeds this chain
    twice re-runs the md5 pass per consumer (measured 2.0s vs 0.9s for
    the halves at sf0.1).  A multi-referenced, non-cheap projection
    output survives CollapseProject, so the stage boundary holds.

    Batch signatures use the exploded groupBy formulation instead
    (operators/similarity.py:278 — whole-stage codegen, map-side
    combine); this per-row variant exists because a streaming plan
    cannot re-group rows without becoming a second stateful operator.
    """
    toks = TXT.tokenize(text_col)
    sh = TXT.shingles(toks, shingle_n)
    return F.transform(sh, lambda s: F.md5(s.cast("binary")))


def halves_from_hexes(hexes: Column) -> tuple[Column, Column]:
    """(h1s, h2s) Kirsch-Mitzenmacher halves from the md5 hex array."""
    h1s = F.transform(
        hexes, lambda x: F.conv(F.substring(x, 1, 15), 16, 10).cast("bigint")
    )
    h2s = F.transform(
        hexes,
        lambda x: F.pmod(
            F.conv(F.substring(x, 17, 15), 16, 10).cast("bigint"), F.lit(2**58)
        ),
    )
    return h1s, h2s


def sig_from_halves(h1s: Column, h2s: Column, num_hashes: int = 16) -> Column:
    """array<bigint> signature: sig[k] = min(h1 + k*h2) over shingles."""
    return F.array(
        *[
            F.array_min(F.zip_with(h1s, h2s, lambda a, b: a + F.lit(k) * b))
            for k in range(num_hashes)
        ]
    )


def neardup_tag_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    n_buckets: int = 64,
    ttl_ms: int = 365 * 24 * 3600 * 1000,
) -> DataFrame:
    """Tag streaming documents against the online LSH index.

    Emits one row PER BAND HIT: ``(doc_id, ts_ms, band, first_id,
    est_sim)`` — doc ``doc_id`` landed in a band bucket first claimed by
    ``first_id``, and their full signatures agree on ``est_sim`` of
    components.  Docs that only claim fresh buckets (primes) emit
    nothing; docs shorter than ``shingle_n`` tokens have no signature
    and bypass the index entirely.

    First-wins per bucket: a hit does NOT re-register the bucket, so
    every later member of a near-dup cluster is scored against the
    cluster's FIRST representative — transitive-chain drift (A~B~C with
    A!~C) cannot creep in, and the batch oracle is a plain min(doc_id)
    per bucket.
    """
    rows = num_hashes // bands
    hexed = stream.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(ts_col).alias("ts"),
        rowwise_md5_hexes(text_col, shingle_n).alias("hx"),
    ).filter(F.size("hx") > 0)
    h1s, h2s = halves_from_hexes(F.col("hx"))
    halves = hexed.select(
        "doc_id", "ts", h1s.alias("h1s"), h2s.alias("h2s")
    )
    sigged = halves.select(
        "doc_id",
        "ts",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        sig_from_halves(F.col("h1s"), F.col("h2s"), num_hashes).alias("sig"),
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.col("sig")[b * rows].alias("k1"),
                F.col("sig")[b * rows + 1].alias("k2"),
            )
            for b in range(bands)
        ]
    )
    keyed = (
        sigged.select(
            "doc_id", "ts", "ts_ms", "sig", F.explode(band_structs).alias("bh")
        )
        .select(
            "doc_id",
            "ts",
            "ts_ms",
            "sig",
            F.col("bh.band").alias("band"),
            F.col("bh.k1").alias("k1"),
            F.col("bh.k2").alias("k2"),
        )
        # routing hash only — band identity inside state is the raw
        # (band, k1, k2) row values, engine-independent
        .withColumn(
            "bucket", F.pmod(F.xxhash64("band", "k1", "k2"), F.lit(n_buckets))
        )
        .withWatermark("ts", f"{max(ttl_ms // 1000, 1)} seconds")
    )

    out_schema = (
        "doc_id long, ts_ms long, band int, first_id long, est_sim double"
    )
    state_schema = "blob binary"  # pickled dict — see stateful.py:112-118

    def fn(
        bucket: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pickle

        if state.hasTimedOut:
            state.remove()
            return
        index: dict = (
            pickle.loads(bytes(state.get[0])) if state.exists else {}
        )
        chunks = [
            pdf[["doc_id", "ts_ms", "band", "k1", "k2", "sig"]] for pdf in pdfs
        ]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        )
        # deterministic arrival order inside the batch (chunk-merge rule
        # as stateful.py:137-145)
        pdf = pdf.sort_values(["ts_ms", "doc_id"], kind="mergesort")
        o_doc, o_ts, o_band, o_first, o_est = [], [], [], [], []
        for doc, ts, band, k1, k2, sig in zip(
            pdf["doc_id"].tolist(),
            pdf["ts_ms"].tolist(),
            pdf["band"].tolist(),
            pdf["k1"].tolist(),
            pdf["k2"].tolist(),
            pdf["sig"].tolist(),
        ):
            key = (int(band), int(k1), int(k2))
            sig = tuple(int(x) for x in sig)
            entry = index.get(key)
            if entry is not None and int(ts) - entry[1] > ttl_ms:
                entry = None  # expired: bucket is free again
            if entry is None:
                index[key] = (int(doc), int(ts), sig)
            else:
                first_id, _first_ts, first_sig = entry
                est = sum(a == b for a, b in zip(sig, first_sig)) / len(sig)
                o_doc.append(int(doc))
                o_ts.append(int(ts))
                o_band.append(int(band))
                o_first.append(first_id)
                o_est.append(est)
        wm = state.getCurrentWatermarkMs()
        if wm > 0:
            dead = [k for k, e in index.items() if e[1] + ttl_ms < wm]
            for k in dead:
                del index[k]
        state.update((pickle.dumps(index, protocol=pickle.HIGHEST_PROTOCOL),))
        state.setTimeoutTimestamp(wm + ttl_ms + 1 if wm > 0 else ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(o_doc, dtype="int64"),
                "ts_ms": pd.Series(o_ts, dtype="int64"),
                "band": pd.Series(o_band, dtype="int32"),
                "first_id": pd.Series(o_first, dtype="int64"),
                "est_sim": pd.Series(o_est, dtype="float64"),
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
