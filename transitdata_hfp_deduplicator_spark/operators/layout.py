"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional scan pruning.

At 100 TB the fastest query is the one that never reads the file:
parquet footers carry per-file min/max for every column, and a scan
with a predicate on column A skips files whose [min_A, max_A] misses.
Sorting the table by A makes A-pruning perfect and B-pruning useless;
interleaving the BITS of A and B (the Z-order curve) bounds BOTH
columns in every contiguous range of the sort — the standard layout
trick (Delta/Iceberg OPTIMIZE ZORDER) expressed here as plain columnar
arithmetic + repartitionByRange, no engine extension needed.

Everything is deterministic integer bit-math (shifts, masks, sums), so
the curve — and therefore the file assignment — is engine-independent
and oracle-checkable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column | str, b: Column | str, bits: int = 20) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i.
    2*bits must stay under 63 (signed-bigint safe): bits<=31.

    The 2*bits terms are plain shift/mask expressions — whole-stage
    codegen folds them into straight-line long arithmetic.
    """
    if isinstance(a, str) and isinstance(b, str):
        # one parsed expression (vs ~8 py4j round trips per bit —
        # ~0.3 s of driver time per construction at bits=20); integer-
        # exact, same left-associated sum (guide §7.3)
        terms = []
        for i in range(bits):
            terms.append(
                f"shiftleft(shiftright(CAST(`{a}` AS BIGINT), {i}) & 1,"
                f" {2 * i + 1})"
            )
            terms.append(
                f"shiftleft(shiftright(CAST(`{b}` AS BIGINT), {i}) & 1, {2 * i})"
            )
        return F.expr(" + ".join(terms))
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x + y, terms)


def zorder_file_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 10,
) -> DataFrame:
    """Assign rows to ``n_files`` equal-Z-width files and report each
    file's (min, max) envelope on BOTH dimensions plus row count — the
    exact numbers a parquet footer would carry after a Z-order rewrite,
    i.e. the pruning power of the layout, measurable before writing a
    byte.

    Both dimensions are first min/max-rescaled to the full ``bits``
    range (a raw interleave of unequal domains leaves most of the curve
    empty and every row in file 0).  The global min/max ride in via a
    1-row-aggregate crossJoin — broadcast, no collect, no second job.
    The rescale is exact: the integers involved stay far below 2^53, so
    the double divide + floor is identically rounded in every IEEE
    engine.

    File id is ``z // (2^(2 bits) / n_files)`` — a pure function of the
    z-value (NOT ntile/rank), so the assignment is stable under inserts
    away from the touched range and reproducible in any engine
    (``n_files`` must divide the z-domain: power of two).  The real
    write path is ``df.repartitionByRange(n_files, zvalue(...))`` +
    parquet; range partitioning by z is a range partition of the SAME
    curve, so these stats bound what the writer produces.
    """
    assert n_files & (n_files - 1) == 0, "n_files must be a power of two"
    lim = (1 << bits) - 1
    bounds = df.agg(
        F.min(F.col(col_a).cast("bigint")).alias("lo_a"),
        F.max(F.col(col_a).cast("bigint")).alias("hi_a"),
        F.min(F.col(col_b).cast("bigint")).alias("lo_b"),
        F.max(F.col(col_b).cast("bigint")).alias("hi_b"),
    )

    def scaled(c: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        return F.when(span == 0, F.lit(0)).otherwise(
            F.floor((F.col(c).cast("bigint") - F.col(lo)) * lim / span)
        )

    width = (1 << (2 * bits)) // n_files
    return (
        df.join(F.broadcast(bounds))
        # name the scaled coordinates first so zvalue takes its one-
        # F.expr fast path (the optimizer collapses the two projects;
        # same composed expression, ~160 fewer py4j round trips)
        .select(
            F.col(col_a).alias("a"),
            F.col(col_b).alias("b"),
            scaled(col_a, "lo_a", "hi_a").alias("_sa"),
            scaled(col_b, "lo_b", "hi_b").alias("_sb"),
        )
        .select(
            "a",
            "b",
            zvalue("_sa", "_sb", bits).alias("z"),
        )
        # explicit floor, not a double->bigint cast: Spark's cast
        # truncates but DuckDB's rounds — floor is the one spelling
        # every engine agrees on
        .select("a", "b", F.floor(F.col("z") / F.lit(width)).cast("bigint").alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
    )
