"""SparkSession factory tuned for this engine.

Local mode is the test harness; the configs are chosen so the same plans
scale to a multi-executor cluster:

* AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  at 100 TB the static ``shuffle.partitions`` is always wrong, AQE
  re-plans from real map-output sizes.
* ``spark.sql.session.timeZone=UTC`` — the reference's timestamps are
  UTC (hfp `tst` field) and the DuckDB oracle is UTC-naive.
* Arrow enabled — every Python-side operator here uses Pandas UDFs /
  mapInPandas (Arrow batches), never row-at-a-time UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


_WAREHOUSE: str | None = None


def _default_warehouse() -> str:
    global _WAREHOUSE
    if _WAREHOUSE is None:
        _WAREHOUSE = os.environ.get("SPARK_GRAFT_WAREHOUSE") or __import__(
            "tempfile"
        ).mkdtemp(prefix="spark_graft_warehouse_")
    return _WAREHOUSE


def get_spark(
    app_name: str = "transitdata-hfp-deduplicator-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata timestamps are parquet TIMESTAMP(isAdjustedToUTC=false);
        # inferTimestampNTZ would surface them as TIMESTAMP_NTZ, breaking
        # instant functions (unix_millis, window, watermarks).  Read them
        # as TIMESTAMP — with the UTC session TZ the wall values match the
        # TZ-naive DuckDB oracle exactly.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # A long session compiles THOUSANDS of generated classes (132
        # registered queries × whole-stage codegen + 16-column hash
        # projections); the JVM's default 240 MB code cache fills, the
        # JIT stops compiling, and codegen-heavy plans (minhash md5
        # family) degrade 2-10x run-to-run.  512 MB sufficed at 85
        # queries; at 132 the tail queries (q_graph_triangles at slot
        # 130) measured 2.7x their early-slot time — 1 GiB keeps hot
        # methods compiled for the whole bench/gate sweep.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        # Long-lived session hygiene: with a large heap, driver GC may
        # not run for the whole session, so the ContextCleaner never
        # releases finished queries' shuffle files / broadcasts — disk
        # and heap litter accumulates and later queries degrade.  A
        # 1-minute periodic GC keeps cleanup flowing; on a real cluster
        # this also caps executor shuffle-dir growth between jobs.
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        # \r console-progress spam interleaves with stdout and can push
        # bench.py's final JSON line past the driver's tail-capture
        # window (BENCH_r03 recorded "parsed": null) — keep stdout clean.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # saveAsTable (bucketed-layout writes, sinks.write_bucketed)
        # must not litter ./spark-warehouse in the repo — park the
        # default warehouse in a throwaway dir.  Real deployments set
        # this to the lake path; table writers can also pass an
        # explicit path per table.
        .config("spark.sql.warehouse.dir", _default_warehouse())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
