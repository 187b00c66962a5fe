"""Z-order layout (operators/layout.py): the curve itself, and the
pruning property that justifies it — every file bounds BOTH dimensions,
which a single-column sort cannot do."""

from __future__ import annotations

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.layout import (
    zorder_file_stats,
    zvalue,
)


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 63, 1023) for b in (0, 2, 7, 64, 1000)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zvalue("a", "b", 10).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_py(r.a, r.b, 10), (r.a, r.b)


def test_zorder_files_bound_both_dimensions(spark):
    """64x64 uniform grid, 16 files, bits=6: each file is one aligned
    16x16 tile — envelopes of width 16 on BOTH dims, 256 rows each.
    (A sort by `a` would give width-64 envelopes on `b` in every file.)"""
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    stats = zorder_file_stats(df, "a", "b", n_files=16, bits=6).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows == 256
        assert r.max_a - r.min_a == 15, r
        assert r.max_b - r.min_b == 15, r


def test_zorder_rescale_handles_offset_domains(spark):
    """Unequal, offset domains are rescaled to the full curve: files
    stay non-degenerate (no all-rows-in-file-0 collapse) and every row
    is assigned exactly once."""
    rows = [(a + 5000, b + 17) for a in range(0, 1000, 7) for b in range(0, 40, 3)]
    df = spark.createDataFrame(rows, "a long, b long")
    stats = zorder_file_stats(df, "a", "b", n_files=8, bits=10)
    got = stats.agg(
        F.sum("n_rows").alias("n"), F.count(F.lit(1)).alias("files")
    ).collect()[0]
    assert got.n == len(rows)
    assert got.files == 8


def test_zorder_write_path_bounds_real_files(spark, tmp_path):
    """The actual write path — repartitionByRange on the z-value +
    parquet — must produce files whose REAL per-file min/max envelopes
    bound both dimensions well below the global domain (the footer
    stats a scan would prune on), not just the planner's prediction."""
    import glob
    import os

    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = str(tmp_path / "z")
    df.repartitionByRange(16, zvalue("a", "b", 6)).write.parquet(out)
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 16
    import pyarrow.parquet as pq

    for f in files:
        t = pq.read_table(f)
        a, b = t.column("a").to_pylist(), t.column("b").to_pylist()
        # a contiguous z-range of ~256 curve points stays within a
        # 32x32 region of the 64x64 domain — half the global width on
        # BOTH dims (a plain sort bounds one dim and leaves the other
        # full-width)
        assert max(a) - min(a) <= 32, f
        assert max(b) - min(b) <= 32, f
