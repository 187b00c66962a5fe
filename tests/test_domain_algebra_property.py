"""Empirical soundness battery for the window-audit domain algebra
(plans/inspect.py, round 11).

The algebra's one inviolable property is NEVER UNDER-CLAIM: whenever
it declares a grouping expression's domain countable (finite / range)
or time-quantized, the claim must dominate reality —

  * countable: the claimed cardinality bound >= the ACTUAL number of
    distinct values the expression takes on real data;
  * time: every pair of distinct values the expression takes is >= the
    claimed granularity (in seconds) apart.

Structural unit tests pin known holes one by one; this battery sweeps
a deterministic pseudo-random expression space (clamps, moduli,
rescales, branches, time buckets, compositions thereof) and checks the
invariant against sf0.001 data, so a future arithmetic slip in ANY
rule (a wrong quant propagation, a bad interval endpoint, a granular
unit mix-up) fails here even without a hand-written counter-case.
Over-claiming (flagging something actually small) costs only an
explicit waiver; under-claiming would let a corpus-sized single-task
window through the audit — the asymmetry this test enforces.
"""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.plans.inspect import (
    _CARDINALITY_CEILING,
    _bounded_grouping_expr,
    _collect_alias_defs,
    _dom_count,
    _expr_domain,
)
from transitdata_hfp_deduplicator_spark.tables import read_parquet


def _grouping_domain(df):
    """(domain, count_bound, flagged) for the single grouping expression
    of df's optimized Aggregate — the same plan access path the audit
    itself uses, so the battery tests exactly what runs in anger."""
    plan = df._jdf.queryExecution().optimizedPlan()
    node = plan
    while node.getClass().getSimpleName() != "Aggregate":
        node = node.children().apply(0)
    ge = node.groupingExpressions()
    assert ge.length() == 1
    expr = ge.apply(0)
    defs: dict = {}
    _collect_alias_defs(node, defs)
    dom = _expr_domain(expr, defs)
    try:
        tname = str(expr.dataType().typeName())
    except Exception:  # noqa: BLE001
        tname = None
    count = _dom_count(dom, tname)
    bounded = _bounded_grouping_expr(expr, defs)
    return dom, count, bounded


def _to_seconds(v):
    """Collected grouping value -> epoch seconds (for gran checks)."""
    if isinstance(v, datetime.datetime):
        return v.timestamp()
    if isinstance(v, datetime.date):
        return v.toordinal() * 86400.0
    return float(v)


def _numeric_exprs(rng: random.Random):
    """Deterministic pseudo-random numeric grouping expressions, biased
    toward shapes the algebra claims bounded (the interesting cases)."""
    leaves = [
        lambda: F.col("doc_id"),
        lambda: F.col("doc_id").cast("double") / F.lit(7.0),
        lambda: F.xxhash64("lang"),
        lambda: F.length("text"),
    ]

    def clamp(x):
        lo = rng.choice([0, 1, -5])
        hi = lo + rng.choice([7, 63, 999])
        return F.least(F.greatest(x, F.lit(lo)), F.lit(hi))

    def mod(x):
        return F.pmod(x, F.lit(rng.choice([8, 97, 1000, 4096])))

    def rem(x):
        return x % F.lit(rng.choice([16, 101, 2048]))

    def scale(x):
        return x * F.lit(rng.choice([3, 11, 100, -7]))

    def rescale(x):
        return x / F.lit(rng.choice([2.0, 16.0, 250.0, -4.0]))

    def disc(x):
        return F.floor(x)

    def branch(x):
        return (
            F.when(x > F.lit(10), F.lit(1))
            .when(x > F.lit(5), F.lit(0))
            .otherwise(F.lit(-1))
        )

    def mixed_branch(x):
        # If/CASE whose branches mix the expression itself with a
        # literal: exercises the union-hull rule, not just finite sums
        return F.when(x > F.lit(3), x).otherwise(F.lit(0))

    def absval(x):
        return F.abs(x)

    def neg(x):
        return -x

    def coal(x):
        return F.coalesce(x, F.lit(rng.randint(-3, 3)))

    def shift(x):
        return x + F.lit(rng.randint(-50, 50))

    unaries = [
        clamp, mod, rem, scale, rescale, disc, branch,
        mixed_branch, absval, neg, coal, shift,
    ]
    out = []
    for _ in range(60):
        e = rng.choice(leaves)()
        for _ in range(rng.randint(1, 4)):
            e = rng.choice(unaries)(e)
        out.append(e)
    # sums/differences of two INDEPENDENTLY bounded terms: exercises
    # additive interval arithmetic and the mixed-quant fallback
    for _ in range(12):
        a = mod(rng.choice(leaves)())
        b = clamp(rng.choice(leaves)())
        e = a + b if rng.random() < 0.5 else a - b
        if rng.random() < 0.5:
            e = disc(rescale(e))
        out.append(e)
    # a few hand-picked compositions the registry actually uses
    out.append(F.pmod(F.xxhash64("lang"), F.lit(32)))
    out.append(
        F.least(F.greatest(F.col("doc_id") % 100, F.lit(0)), F.lit(7))
    )
    out.append(
        F.floor(
            F.least(
                F.greatest(F.col("doc_id").cast("double") / 7.0, F.lit(0.0)),
                F.lit(1.0),
            )
            * F.lit(255.0)
        )
    )
    out.append(
        F.struct(
            F.pmod(F.col("doc_id"), F.lit(50)).alias("a"),
            F.pmod(F.xxhash64("lang"), F.lit(50)).alias("b"),
        )
    )
    return out


def _time_exprs(rng: random.Random):
    ts = F.col("ts")
    out = [
        F.unix_timestamp(ts),
        F.date_trunc("minute", ts),
        F.date_trunc("hour", ts),
        F.date_trunc("day", ts),
        ts.cast("date"),
        F.floor(F.unix_timestamp(ts) / F.lit(60)),
        F.floor(F.unix_timestamp(ts) / F.lit(3600)) * F.lit(2),
        F.unix_timestamp(F.window(ts, "1 minute").getField("start")),
        F.unix_timestamp(F.window(ts, "5 minutes").getField("start")),
        F.unix_timestamp(F.date_trunc("hour", ts)) + F.lit(30),
    ]
    for _ in range(10):
        mins = rng.choice([1, 2, 5, 15])
        e = F.floor(F.unix_timestamp(ts) / F.lit(60 * mins))
        if rng.random() < 0.5:
            e = e * F.lit(rng.choice([2, 60]))
        if rng.random() < 0.5:
            e = e + F.lit(rng.randint(-5, 5))
        out.append(e)
    # ADVICE r11 #2: an integral re-cast of an already-numeric time
    # value is an identity — the old rule corrupted unit 60 -> 1.0, so
    # the pmod variant's claimed quant over-stated real spacing 60x and
    # its count claim (49) sat far UNDER the actual distinct residues
    # (<= 1440) — this pair fails the battery under the old rule.
    minute_int = F.floor(F.unix_timestamp(ts) / F.lit(60)).cast("int")
    out.append(minute_int)
    out.append(F.pmod(minute_int, F.lit(1440)))
    # ADVICE r11 #3: calendar truncations must claim MINIMUM spacings
    # (February month boundaries are 28 days apart, not the 30.44-day
    # average) and flooring a fractional lattice (90s buckets in a
    # 60s-per-1.0 representation) alternates 60s/120s gaps — both
    # violate the old constants' gran claims.
    out.append(F.date_trunc("month", ts))
    out.append(F.date_trunc("quarter", ts))
    out.append(F.date_trunc("year", ts))
    out.append(F.floor(F.floor(F.unix_timestamp(ts) / F.lit(90)) * F.lit(1.5)))
    # round-12 self-review: the SIBLING discretization sites of ADVICE
    # r11 #2/#3 — IntegralDivide over a fractional time lattice, the
    # mod-truncation (tumbling-compile) Subtract snapping a 90s lattice
    # onto a 60s step (gaps alternate 60s/120s, never 90s), and
    # unix_timestamp of a fractional-second window (integer-second
    # output can only claim floor(gran)) — each fails the battery under
    # the pre-r12 max(gran, step) rules.
    out.append(F.expr("(floor(unix_timestamp(ts) / 90) * 1.5) div 1"))
    out.append(
        F.expr("unix_timestamp(window(ts, '1 minute').start) div 7")
    )
    out.append(F.expr(
        "floor(unix_timestamp(ts) / 90) * 90"
        " - ((floor(unix_timestamp(ts) / 90) * 90 - 0) % 60)"
    ))
    # the timeline is compressed 1000x first so adjacent 1.5s buckets
    # actually occur in the sparse events data — otherwise every
    # observed gap is >= 6s and the old max(gran, 1) claim of 1.5s can
    # never be falsified empirically
    out.append(
        F.unix_timestamp(
            F.window(
                F.timestamp_seconds(F.unix_timestamp(ts) / F.lit(1000)),
                "1500 milliseconds",
            ).getField("start")
        )
    )
    return out


@pytest.mark.slow
def test_domain_algebra_never_underclaims(spark, sf_dir):
    rng = random.Random(1107)
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    ev = read_parquet(spark, f"{sf_dir}/events.parquet").select("ts")

    checked_counts = 0
    checked_grans = 0
    for base, exprs in (
        (docs, _numeric_exprs(rng)),
        (ev, _time_exprs(rng)),
    ):
        for i, e in enumerate(exprs):
            df = base.groupBy(e.alias("k")).agg(
                F.count(F.lit(1)).alias("n")
            )
            dom, count, bounded = _grouping_domain(df)
            try:
                if dom[0] in ("finite", "range") and count is not None:
                    actual = df.count()
                    assert actual <= count + 0.5, (
                        f"UNDER-CLAIM expr#{i}: claimed <= {count} distinct, "
                        f"actual {actual} (domain {dom})"
                    )
                    checked_counts += 1
                elif dom[0] == "time":
                    gran = dom[1]
                    unit = dom[2]
                    rows = [
                        r["k"]
                        for r in df.select("k").collect()
                        if r["k"] is not None
                    ]
                    if not rows:
                        continue
                    temporal = isinstance(
                        rows[0], (datetime.datetime, datetime.date)
                    )
                    vals = sorted(_to_seconds(v) for v in rows)
                    # temporal python values are already seconds;
                    # numeric representations carry `unit` seconds per
                    # 1.0 — the unit itself is part of what's under
                    # test for the scaled variants
                    scale_s = 1.0 if temporal else unit
                    diffs = [
                        (b - a) * scale_s for a, b in zip(vals, vals[1:])
                    ]
                    if diffs:
                        assert min(diffs) >= gran * (1 - 1e-9) - 1e-6, (
                            f"GRAN UNDER-CLAIM expr#{i}: claimed {gran}s, "
                            f"observed spacing {min(diffs)}s (domain {dom})"
                        )
                        checked_grans += 1
                if bounded:
                    # the gate's own promise, checked end-to-end
                    actual = df.count()
                    assert actual <= _CARDINALITY_CEILING, (
                        f"expr#{i} claimed bounded but has {actual} groups"
                    )
            except AssertionError:
                raise
            except Exception:  # noqa: BLE001
                # ANSI runtime errors (e.g. long overflow in a
                # generated xxhash64*3): the query never materializes
                # values, so there is nothing to compare a claim
                # against — skipping is sound, and the coverage
                # minimums below guard against a vacuous pass
                continue
    # the battery must actually exercise both claim kinds — if a
    # refactor silently turns everything unbounded, fail loudly rather
    # than pass vacuously
    print(
        f"domain-algebra battery: {checked_counts} count claims, "
        f"{checked_grans} gran claims verified"
    )
    # measured at introduction: 56 count / 20 gran claims verified
    assert checked_counts >= 40, f"only {checked_counts} count claims checked"
    assert checked_grans >= 15, f"only {checked_grans} gran claims checked"


def test_getstructfield_survives_optimizer_exclusion(spark, sf_dir):
    """The GetStructField branch is normally dead (Catalyst's
    SimplifyExtractValueOps collapses field extraction over
    CreateNamedStruct before the audit sees it) — exclude that rule so
    the extraction survives and pin that the audit still recognizes the
    tumbling-window start field as minute-quantized."""
    from pyspark.sql.window import Window as W

    from transitdata_hfp_deduplicator_spark.plans.inspect import (
        unpartitioned_window_violations,
    )

    ev = read_parquet(spark, f"{sf_dir}/events.parquet").select("ts")
    key = "spark.sql.optimizer.excludedRules"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.catalyst.optimizer.SimplifyExtractValueOps",
        )
        agg = ev.groupBy(
            F.window(F.col("ts"), "1 minute").getField("start").alias("k")
        ).agg(F.count(F.lit(1)).alias("n"))
        df = agg.withColumn("r", F.sum("n").over(W.orderBy("k")))
        assert unpartitioned_window_violations(df) == []
        # and a sub-minute window through the same path still flags
        agg2 = ev.groupBy(
            F.window(F.col("ts"), "30 seconds").getField("start").alias("k")
        ).agg(F.count(F.lit(1)).alias("n"))
        df2 = agg2.withColumn("r", F.sum("n").over(W.orderBy("k")))
        assert len(unpartitioned_window_violations(df2)) == 1
    finally:
        if old:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
