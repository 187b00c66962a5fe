"""JSONL corpus source/sink (sources/corpus.py): declared-schema read,
malformed-line quarantine, gzip round-trip fidelity."""

from __future__ import annotations

import gzip
import os
import tempfile

import pyspark.sql.functions as F

from transitdata_hfp_deduplicator_spark import tables
from transitdata_hfp_deduplicator_spark.sources.corpus import (
    read_jsonl,
    write_jsonl,
)


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_read_well_formed_and_computes_n_chars(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    _write_lines(
        p,
        [
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
            '{"doc_id": 2, "text": "salut", "lang": "fr", "source": "web", "n_chars": 999}',
        ],
    )
    docs, quarantine = read_jsonl(spark, p)
    rows = {r.doc_id: r for r in docs.collect()}
    assert quarantine.count() == 0
    assert rows[1].n_chars == 11  # computed from text when absent
    assert rows[2].n_chars == 999  # declared value wins
    assert rows[1].meta is None


def test_malformed_lines_quarantined_not_thrown(spark, tmp_path):
    p = str(tmp_path / "corpus.jsonl")
    _write_lines(
        p,
        [
            '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}',
            "this is not json at all {{{",
            '{"doc_id": "NOT_A_NUMBER", "text": "bad type", "lang": "en", "source": "s"}',
            '{"doc_id": 3, "text": "also ok", "lang": "de", "source": "s"}',
        ],
    )
    docs, quarantine = read_jsonl(spark, p)
    assert docs.count() == 2
    assert {r.doc_id for r in docs.collect()} == {1, 3}
    q = [r.raw_line for r in quarantine.collect()]
    assert len(q) == 2
    assert any("not json" in x for x in q)


def test_gzip_roundtrip_preserves_documents_table(spark, sf_dir):
    d = tables.table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "shards")
        write_jsonl(d, out, shards=4)
        files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
        assert len(files) == 4
        # shards really are gzip
        with gzip.open(os.path.join(out, files[0]), "rt") as f:
            assert f.readline().startswith("{")
        back, quarantine = read_jsonl(spark, out)
        assert quarantine.count() == 0
        a = {
            tuple(r)
            for r in d.select("doc_id", "text", "lang", "source").collect()
        }
        b = {
            tuple(r)
            for r in back.select("doc_id", "text", "lang", "source").collect()
        }
        assert a == b


def test_read_uses_declared_schema_no_inference_pass(spark, tmp_path):
    # schema must come from the declaration, not inference: a file whose
    # every row misses a declared column still yields that column (null)
    p = str(tmp_path / "c.jsonl")
    _write_lines(p, ['{"doc_id": 7, "text": "t", "lang": "en", "source": "s"}'])
    docs, _ = read_jsonl(spark, p)
    assert "meta" in docs.columns
    assert docs.schema["doc_id"].dataType.typeName() == "long"
