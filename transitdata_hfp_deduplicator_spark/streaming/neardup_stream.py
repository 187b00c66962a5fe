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
    """array<bigint> signature: sig[k] = min((h1 + k*h2) & (2^59-1))
    over shingles — the 59-bit wrap keeps the k components independent
    (see operators/similarity.py:minhash_signatures for the measured
    failure mode without it)."""
    mask = F.lit((1 << 59) - 1)
    return F.array(
        *[
            F.array_min(
                F.zip_with(h1s, h2s, lambda a, b: (a + F.lit(k) * b).bitwiseAND(mask))
            )
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
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
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
    # Band identity = ALL `rows` components of the band's signature
    # slice (as operators/similarity.py:_banded hashes the full slice) —
    # keying on a fixed 2-component prefix would loosen candidacy for
    # rows > 2 and read out of bounds for rows == 1.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array(
                    *[F.col("sig")[b * rows + r] for r in range(rows)]
                ).alias("ks"),
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
            F.col("bh.ks").alias("ks"),
        )
        # routing hash only — band identity inside state is the raw
        # (band, *ks) row values, engine-independent
        .withColumn(
            "bucket", F.pmod(F.xxhash64("band", "ks"), F.lit(n_buckets))
        )
        .withWatermark("ts", f"{max(ttl_ms // 1000, 1)} seconds")
    )

    out_schema = (
        "doc_id long, ts_ms long, band int, first_id long, est_sim double"
    )
    # State rides as NUMPY-COLUMNAR binaries, not a pickled dict: the
    # state value is rewritten wholesale every batch, so serialization
    # is O(index size) per batch and the codec constant is the whole
    # game — measured 5.7s vs 0.5s per batch round-trip at ~720k
    # entries for dict-pickle vs tobytes/frombuffer.  Layout: keys
    # (n,1+rows: band,*slice), meta (n,2: first_id,first_ts), sigs
    # (n,num_hashes), all int64.  The per-batch lookup dict is rebuilt
    # from the key rows (~1ms per bucket) and immutable history stays
    # zero-copy views over the state buffers.
    state_schema = "keys binary, meta binary, sigs binary"

    def fn(
        bucket: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        nh = num_hashes
        kw = 1 + rows  # key row width: band + the full band slice
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            kb, mb, sb = state.get
            keys = np.frombuffer(bytes(kb), dtype=np.int64).reshape(-1, kw)
            meta = np.frombuffer(bytes(mb), dtype=np.int64).reshape(-1, 2)
            sigs = np.frombuffer(bytes(sb), dtype=np.int64).reshape(-1, nh)
        else:
            keys = np.empty((0, kw), dtype=np.int64)
            meta = np.empty((0, 2), dtype=np.int64)
            sigs = np.empty((0, nh), dtype=np.int64)
        lut = {tuple(k): i for i, k in enumerate(keys.tolist())}
        overridden: set[int] = set()
        new_keys: list[tuple] = []
        new_meta: list[tuple] = []
        new_sigs: list[tuple] = []
        new_lut: dict = {}

        chunks = [
            pdf[["doc_id", "ts_ms", "band", "ks", "sig"]] for pdf in pdfs
        ]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        )
        # deterministic arrival order inside the batch (chunk-merge rule
        # as stateful.py:137-145)
        pdf = pdf.sort_values(["ts_ms", "doc_id"], kind="mergesort")
        o_doc, o_ts, o_band, o_first, o_est = [], [], [], [], []
        for doc, ts, band, ks, sig in zip(
            pdf["doc_id"].tolist(),
            pdf["ts_ms"].tolist(),
            pdf["band"].tolist(),
            pdf["ks"].tolist(),
            pdf["sig"].tolist(),
        ):
            key = (int(band), *(int(x) for x in ks))
            ts = int(ts)
            entry = new_lut.get(key)
            if entry is not None:
                first_id, first_ts, first_sig = new_meta[entry][0], new_meta[entry][1], new_sigs[entry]
            else:
                i = lut.get(key)
                if i is not None and i not in overridden:
                    first_id, first_ts = int(meta[i, 0]), int(meta[i, 1])
                    first_sig = sigs[i]
                else:
                    first_id = None
            if first_id is not None and ts - first_ts > ttl_ms:
                # expired: free the bucket (mark history row dead if it
                # was the stored one)
                if entry is None and key in lut:
                    overridden.add(lut[key])
                else:
                    # new-entry expiry within one batch needs ttl <
                    # batch time-span; replace in place
                    new_meta[entry] = None  # type: ignore[index]
                first_id = None
            if first_id is None:
                if entry is not None and new_meta[entry] is None:
                    new_meta[entry] = (int(doc), ts)
                    new_sigs[entry] = tuple(int(x) for x in sig)
                else:
                    new_lut[key] = len(new_keys)
                    new_keys.append(key)
                    new_meta.append((int(doc), ts))
                    new_sigs.append(tuple(int(x) for x in sig))
            else:
                s = sig if isinstance(sig, np.ndarray) else np.asarray(sig)
                est = float(np.count_nonzero(s == first_sig)) / nh
                o_doc.append(int(doc))
                o_ts.append(ts)
                o_band.append(int(band))
                o_first.append(int(first_id))
                o_est.append(est)
        wm = state.getCurrentWatermarkMs()
        keep = np.ones(len(keys), dtype=bool)
        if overridden:
            keep[list(overridden)] = False
        if wm > 0:
            keep &= meta[:, 1] + ttl_ms >= wm  # vectorized TTL prune
        keys_out = np.concatenate(
            [keys[keep], np.asarray(new_keys, dtype=np.int64).reshape(-1, kw)]
        )
        meta_out = np.concatenate(
            [meta[keep], np.asarray(new_meta, dtype=np.int64).reshape(-1, 2)]
        )
        sigs_out = np.concatenate(
            [sigs[keep], np.asarray(new_sigs, dtype=np.int64).reshape(-1, nh)]
        )
        state.update(
            (keys_out.tobytes(), meta_out.tobytes(), sigs_out.tobytes())
        )
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
