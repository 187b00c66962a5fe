"""JSONL corpus source/sink — the LLM-pipeline interchange format.

Web-scale training corpora ship as line-delimited JSON (one document
object per line: Dolma, RedPajama, FineWeb, C4 all publish this way),
usually gzip-sharded.  The operators in this engine consume a typed
``documents``-shaped DataFrame; this module is the boundary between
the interchange format and that schema.

Scale discipline:

* **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a FULL extra pass over the data to infer one — at 100 TB
  that doubles ingest cost and can widen types per-shard
  (``samplingRatio`` trades cost for wrong schemas instead).  The
  corpus schema is declared once here.
* **Malformed lines are data, not exceptions.**  PERMISSIVE mode +
  ``columnNameOfCorruptRecord`` routes undecodable lines to a side
  column; ``read_jsonl`` splits them into a quarantine frame so a bad
  shard degrades into counted, inspectable rows (the reference's
  schema-dispatch filter A2 made the same choice: skip + count, never
  throw — Deduplicator.java:58-66).
* **Line-splittable compression.**  Plain ``.jsonl`` and ``.jsonl.gz``
  both read; gzip shards are single-split (one task per shard), which
  is the publishing convention's own trade-off — the loader neither
  fixes nor worsens it, but `repartition` after read restores
  parallelism when a few giant shards would skew the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# the engine's document schema (TESTDATA.md `documents` table) plus
# the standard optional metadata fields JSONL corpora carry
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus; returns ``(docs, quarantine)``.

    ``docs`` has the well-formed rows in the declared schema (missing
    optional fields are null; ``n_chars`` is computed from ``text``
    when absent).  ``quarantine`` has one row per malformed line with
    the raw line text — count it, sample it, never throw on it.

    Implementation: text read + ``from_json`` with the corrupt column
    declared INSIDE the parse schema — not the JSON reader's internal
    ``_corrupt_record``, whose lineage Spark refuses to query on its
    own (QUERY_ONLY_CORRUPT_RECORD_COLUMN: pruning a quarantine
    count() down to just that column is exactly the disallowed shape).
    Same single lazy pass, no cache requirement, and the raw line is
    retained verbatim for quarantine at zero extra cost."""
    lines = spark.read.text(path).select(F.col("value").alias("raw_line"))
    parsed = lines.select(
        "raw_line",
        F.from_json(
            "raw_line",
            CORPUS_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("d"),
    )
    bad = F.col("d").isNull() | F.col("d").getField(CORRUPT_COL).isNotNull()
    quarantine = parsed.filter(bad).select("raw_line", F.col("d.doc_id"))
    docs = (
        parsed.filter(~bad)
        .select("d.*")
        .drop(CORRUPT_COL)
        .withColumn(
            "n_chars", F.coalesce(F.col("n_chars"), F.length("text").cast("long"))
        )
    )
    return docs, quarantine


def write_jsonl(docs: DataFrame, path: str, shards: int | None = None) -> None:
    """Write a documents frame as JSONL shards (gzip).  ``shards``
    controls output file count (shard size is the unit of downstream
    read parallelism for gzip — target 100-500 MB per shard at scale);
    default keeps the input partitioning."""
    out = docs if shards is None else docs.repartition(shards)
    out.write.mode("overwrite").option("compression", "gzip").json(path)
