"""Semantic pins for the corpus-prep queries (mixing, decontamination)
— properties the cell-exact oracle comparison can't state on its own.
"""

from __future__ import annotations

from transitdata_hfp_deduplicator_spark.queries import QUERIES


def test_corpus_mix_binding_language_keeps_all(spark, sf_dir):
    """Fractions are valid probabilities and the binding language (the
    one whose availability limits the budget) keeps everything —
    frac == 1 by construction of T = min(avail/w)."""
    rows = QUERIES["q_corpus_mix"](spark, sf_dir).collect()
    assert rows, "mix produced no languages"
    fracs = {r.lang: r.frac for r in rows}
    assert all(0.0 < f <= 1.0 + 1e-9 for f in fracs.values()), fracs
    assert any(abs(f - 1.0) <= 1e-6 for f in fracs.values()), (
        f"no binding language kept everything: {fracs}"
    )


def test_corpus_mix_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, QUERIES["q_corpus_mix"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["q_corpus_mix"](spark, sf_dir).collect()))
    assert a == b


def test_decontaminate_flags_only_training_docs(spark, sf_dir):
    """Every flagged doc is a TRAINING doc (never the eval slice
    itself) with at least one shared shingle and at least one matching
    eval doc."""
    rows = QUERIES["q_decontaminate"](spark, sf_dir).collect()
    for r in rows:
        assert r.doc_id % 53 != 1, f"eval doc flagged as contaminated: {r}"
        assert r.n_shared >= 1 and r.n_eval_docs >= 1, r


def test_winnow_matches_pure_python_reference(spark, sf_dir):
    """q_text_winnow vs an independent pure-python winnowing
    implementation (Schleimer et al. Fig. 5 semantics: per-window min,
    rightmost tie-break, dedup) over every document at sf0.001."""
    import hashlib
    import os

    got = {
        (r.doc_id, r.pos, r.fp_hash)
        for r in QUERIES["q_text_winnow"](spark, sf_dir).collect()
    }

    import duckdb  # only to read the parquet without a second session

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    ).fetchall()
    want = set()
    K, WIN = 8, 4
    for doc_id, text in docs:
        t = (text or "").strip().lower()
        if len(t) < K:
            continue
        hs = []
        for p in range(1, len(t) - K + 2):  # 1-based like substr
            gram = t[p - 1 : p - 1 + K]
            h40 = int(hashlib.md5(f"13|{gram}".encode()).hexdigest()[:10], 16)
            hs.append((p, h40))
        n = len(hs)
        for s in range(0, n - WIN + 1):
            window = hs[s : s + WIN]
            # min hash, rightmost position on ties
            best = min(window, key=lambda ph: (ph[1], -ph[0]))
            want.add((doc_id, best[0], best[1]))
    assert got == want


def test_seq_pack_sequences_are_contiguous_and_ordered(spark, sf_dir):
    """Packing invariants: every doc lands in exactly one sequence,
    sequence ids per language are contiguous from 0, and a doc's
    sequence id equals its exclusive prefix token count // budget —
    i.e., sequences fill in doc order with no holes."""
    rows = QUERIES["q_seq_pack"](spark, sf_dir).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        prefix = 0
        seqs = set()
        for r in rs:
            assert r.seq_id == prefix // 512, (lang, r)
            prefix += r.n_tok
            seqs.add(r.seq_id)
        assert seqs == set(range(max(seqs) + 1)), f"holes in {lang}: {sorted(seqs)}"


def test_corpus_shuffle_is_a_bijection(spark, sf_dir):
    """The seeded shuffle is a permutation: every doc appears exactly
    once, and positions within each shard are contiguous from 1."""
    rows = QUERIES["q_corpus_shuffle"](spark, sf_dir).collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_gapfill_grid_is_dense(spark, sf_dir):
    """Gap-fill output covers EVERY bucket between each group's min and
    max — no holes — with zero-filled counts on filled rows."""
    rows = QUERIES["q_gapfill"](spark, sf_dir).collect()
    by_g: dict[str, list] = {}
    for r in rows:
        by_g.setdefault(r.event_type, []).append(r)
    hour = 3600 * 1000
    for g, rs in by_g.items():
        ts = sorted(r.hour_ms for r in rs)
        assert ts == list(range(ts[0], ts[-1] + hour, hour)), f"holes in {g}"
        assert all(r.n_events >= 0 for r in rs)


def test_curate_and_seqpack_engine_parity_on_whitespace_runs(spark, tmp_path):
    """ADVICE r7: the curate oracle split on a literal space while the
    Spark path split on \\s+ — hash-exactness held only because the
    test corpus has no whitespace runs.  Both sides now normalize runs
    first; this pins the parity on a corpus the driver's data never
    exercises (double spaces, tabs, newlines, a dup pair identical up
    to whitespace, leading/trailing whitespace)."""
    import duckdb

    word = "abcdefghij"  # 10 letters keeps alpha-ratio >= 0.82 at 40 tokens
    base = " ".join(f"{word}{i % 7}" for i in range(40))
    rows = [
        (0, "en", base),
        (1, "en", base.replace(" ", "  ", 5)),          # ws-run dup of 0
        (2, "en", "\t" + base.replace(" ", " \n", 3) + "  "),  # tabs+newlines dup
        (3, "fi", base + " extraword" * 3),              # near-dup of 0
        (4, "fi", " ".join(f"{word}x{i}" for i in range(45))),  # unique
        (5, "sv", "short doc"),                          # fails the gate
    ]
    src = str(tmp_path / "ws")
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    ).coalesce(1).write.parquet(src + "/documents.parquet")

    from transitdata_hfp_deduplicator_spark.queries import ORACLES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{src}/documents.parquet/*.parquet')"
    )
    for name in ("q_corpus_curate", "q_seq_pack"):
        sdf = QUERIES[name](spark, src)
        cols = sorted(sdf.columns)
        got = sorted(
            tuple(r[c] for c in cols) for r in sdf.collect()
        )
        odf = con.sql(ORACLES[name]).df()
        want = sorted(
            tuple(r[c] for c in cols) for _, r in odf.iterrows()
        )
        assert got == want, f"{name}: {got} != {want}"
    # the normalization must actually bite: docs 0/1/2 are exact dups
    # after it, so the curate manifest packs en from ONE survivor
    curate = {
        (r.lang, r.seq_id): r.n_docs
        for r in QUERIES["q_corpus_curate"](spark, src).collect()
    }
    assert sum(n for (lg, _), n in curate.items() if lg == "en") == 1
