"""Physical-plan inspection helpers.

The engine's scale posture is enforced, not hoped for: tests assert the
plan properties that matter at 100 TB — predicate pushdown reached the
parquet scan, column pruning narrowed ReadSchema, dimension joins went
broadcast, aggregates got a map-side partial pass, and nothing planned
a cartesian product.  (SURVEY.md §4: every one of these is Catalyst's
job; these helpers verify we didn't accidentally write a plan shape
that defeats it.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The query's physical plan as a string (explain() only prints)."""
    qe = df._jdf.queryExecution()
    try:
        return df.sparkSession._jvm.PythonSQLUtils.explainString(qe, mode)
    except Exception:  # noqa: BLE001 - older API fallback
        return qe.executedPlan().toString()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    pushed = "\n".join(
        line for line in plan.splitlines() if "PushedFilters" in line
    )
    assert fragment in pushed, (
        f"expected {fragment!r} in PushedFilters; got: {pushed or '(none)'}"
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Column names the parquet scan actually reads (union over scans)."""
    plan = physical_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= expect, f"expected >={expect} BroadcastHashJoin, found {n}\n{plan[:2000]}"


def assert_no_broadcast_join(df: DataFrame) -> None:
    """The plan must contain NO broadcast exchange at all — used where a
    would-be broadcast side scales with the corpus (e.g. a per-document
    sizes frame): a forced hint there is a driver OOM at 10⁹ docs."""
    plan = physical_plan(df)
    n = plan.count("BroadcastExchange")
    assert n == 0, f"expected 0 BroadcastExchange, found {n}\n{plan[:2000]}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"


# Time-extraction / time-bucketing expressions: their value domain
# scales with the data's TIME SPAN (minutes in a day, weeks in a crawl
# history), not with corpus row count — the distinction the audit
# cares about at 100 TB.  Tumbling-window buckets compile to
# PreciseTimestampConversion arithmetic; truncations/extractions are
# the named classes.  Residual limitation (documented, not closed):
# the class test is by node NAME, so a RAW unix_timestamp(ts) /
# precisetimestampconversion(ts) grouping — second/microsecond
# granularity, near-identity for a dense event stream — passes as
# span-bounded even though its group count over a multi-year span
# rivals corpus size.  Every registry time grouping goes through a
# minute-or-coarser truncation (the pmod subtraction in the tumbling
# compile); a future sub-minute grouping under an unpartitioned window
# deserves the same explicit-waiver treatment as q_corpus_drift.
_TIME_BUCKET_EXPRS = frozenset(
    {
        "UnixTimestamp",
        "ToUnixTimestamp",
        "PreciseTimestampConversion",
        "DateTrunc",
        "TruncDate",
        "TruncTimestamp",
        "ToDate",
        "Year",
        "Quarter",
        "Month",
        "WeekOfYear",
        "DayOfMonth",
        "DayOfWeek",
        "DayOfYear",
        "Hour",
        "Minute",
    }
)


def _collect_alias_defs(node, defs: dict) -> None:
    """Alias name#id -> defining expression, over a plan subtree (the
    grouping expressions of an optimized Aggregate are usually bare
    AttributeReferences whose definition lives in a child Project)."""
    try:
        exprs = node.expressions()
        for i in range(exprs.length()):
            e = exprs.apply(i)
            if e.getClass().getSimpleName() == "Alias":
                defs[str(e.toAttribute().toString())] = e.child()
    except Exception:  # noqa: BLE001 - nodes without expressions()
        pass
    ch = node.children()
    for i in range(ch.length()):
        _collect_alias_defs(ch.apply(i), defs)


# Result types for which a bounded value RANGE implies bounded group
# CARDINALITY (the audit's actual question).  An ALLOWLIST, checked
# recursively through struct/array/map, so a struct<double> cannot
# smuggle a continuous domain past a top-level blocklist.
_DISCRETE_TYPES = frozenset(
    {
        "byte",
        "tinyint",
        "short",
        "smallint",
        "integer",
        "int",
        "long",
        "bigint",
        "boolean",
        "date",
        "timestamp",
        "timestamp_ntz",
    }
)


def _discrete_type(dt) -> bool:
    t = str(dt.typeName())
    if t in _DISCRETE_TYPES:
        return True
    try:
        if t == "struct":
            # StructType IS a Seq[StructField] (fields() hands back a
            # py4j JavaArray, which has no .apply)
            return all(
                _discrete_type(dt.apply(i).dataType())
                for i in range(dt.length())
            )
        if t == "array":
            return _discrete_type(dt.elementType())
        if t == "map":
            return _discrete_type(dt.keyType()) and _discrete_type(
                dt.valueType()
            )
    except Exception:  # noqa: BLE001 - unexpected type shape: be strict
        return False
    return False


def _finite_value_set(expr, defs: dict, depth: int = 0) -> bool:
    """Expression whose value domain is a finite LITERAL enumeration —
    a literal, or CASE WHEN with all-literal branch values (label
    buckets like CASE WHEN hot THEN 'hot' ELSE 'cold' END).  Covers the
    continuous/string groupings that are bounded by enumeration rather
    than by range+discretization."""
    if depth > 40:
        return False
    name = expr.getClass().getSimpleName()
    if name == "Literal":
        return True
    if name == "Alias":
        return _finite_value_set(expr.child(), defs, depth + 1)
    if name == "AttributeReference":
        d = defs.get(str(expr.toString()))
        return d is not None and _finite_value_set(d, defs, depth + 1)
    if name == "CaseWhen":
        try:
            vals = []
            br = expr.branches()
            for i in range(br.length()):
                vals.append(br.apply(i)._2())
            ev = expr.elseValue()
            if ev.isDefined():
                vals.append(ev.get())
            return all(_finite_value_set(v, defs, depth + 1) for v in vals)
        except Exception:  # noqa: BLE001 - be strict
            return False
    if name == "If":
        try:
            return _finite_value_set(
                expr.trueValue(), defs, depth + 1
            ) and _finite_value_set(expr.falseValue(), defs, depth + 1)
        except Exception:  # noqa: BLE001 - be strict
            return False
    return False


def _bounded_grouping_expr(expr, defs: dict, depth: int = 0) -> bool:
    """Structurally bounded GROUP CARDINALITY for a grouping expression:
    either a finite literal enumeration (``_finite_value_set`` — covers
    string label buckets), or value range bounded both below and above
    (``_expr_interval``) AND a discrete result type.  One-sided clamps
    are not enough — ``least(doc_id, 10)`` caps the domain above but
    leaves it corpus-sized below, so the clamp idiom must close both
    ends (``least(greatest(x, 0), N-1)``).  Continuous types are never
    enough — a double clamped to [0, 1] (or ``pmod(price, 1.0)``) has
    a bounded RANGE but corpus-sized CARDINALITY; the discrete-type
    check is a recursive ALLOWLIST (integral / boolean / date /
    timestamp, through struct/array/map) so composite types cannot
    smuggle a continuous field past it (the floor/cast in the bucket
    idiom is what discretizes)."""
    if _finite_value_set(expr, defs, depth):
        return True
    below, above = _expr_interval(expr, defs, depth)
    if not (below and above):
        return False
    try:
        return _discrete_type(expr.dataType())
    except Exception:  # noqa: BLE001 - unresolved expression: be strict
        return False


def _expr_interval(expr, defs: dict, depth: int = 0) -> tuple[bool, bool]:
    """(bounded_below, bounded_above) for an expression's value domain:

    - literals / time buckets (_TIME_BUCKET_EXPRS, span- not
      corpus-scaled): (True, True);
    - modulo by a both-ends-bounded divisor (pmod / %): result
      magnitude < |divisor| -> (True, True);
    - least: min of the operands — bounded ABOVE if ANY operand is,
      bounded BELOW only if ALL are; greatest mirrors it (this is what
      rejects the one-sided least(doc_id, 10) while accepting the
      two-sided least(greatest(x, 0), N-1) shard-clamp idiom);
    - CASE WHEN: componentwise AND over branch VALUES (conditions
      irrelevant);
    - division: bounded ONLY by a fixed non-zero literal divisor (a
      constant rescale) — finite-over-finite is NOT finite (1/x on a
      zero-adjacent interval has unbounded range);
    - any other expression: (True, True) iff ALL children are
      (arithmetic over finite domains stays finite; partial
      one-sidedness is NOT propagated through unknown ops — a
      sign-flipping multiply turns a lower bound into an upper one);
      a non-literal LEAF — an AttributeReference that does not resolve
      to a bounded alias definition — is (False, False) (this is what
      rejects groupBy(doc_id)).
    """
    if depth > 40:
        return (False, False)
    name = expr.getClass().getSimpleName()
    if name == "Literal":
        return (True, True)
    if name in _TIME_BUCKET_EXPRS:
        return (True, True)
    if name == "AttributeReference":
        d = defs.get(str(expr.toString()))
        if d is None:
            return (False, False)
        return _expr_interval(d, defs, depth + 1)
    if name == "Alias":
        return _expr_interval(expr.child(), defs, depth + 1)
    if name == "CaseWhen":
        try:
            vals = []
            br = expr.branches()
            for i in range(br.length()):
                vals.append(br.apply(i)._2())
            ev = expr.elseValue()
            if ev.isDefined():
                vals.append(ev.get())
            ivs = [_expr_interval(v, defs, depth + 1) for v in vals]
            return (all(b for b, _ in ivs), all(a for _, a in ivs))
        except Exception:  # noqa: BLE001 - fall through to children rule
            pass
    if name in ("Least", "Greatest"):
        ch = expr.children()
        ivs = [
            _expr_interval(ch.apply(i), defs, depth + 1)
            for i in range(ch.length())
        ]
        if name == "Least":
            return (all(b for b, _ in ivs), any(a for _, a in ivs))
        return (any(b for b, _ in ivs), all(a for _, a in ivs))
    if name in ("Pmod", "Remainder"):
        ch = expr.children()
        if ch.length() == 2:
            db, da = _expr_interval(ch.apply(1), defs, depth + 1)
            if db and da:
                return (True, True)
        return (False, False)
    if name in ("Divide", "IntegralDivide"):
        # division is NOT finite-over-finite: 1/x on a zero-adjacent
        # bounded interval has unbounded range (and corpus-scale
        # cardinality once floored).  Sound only when the divisor is a
        # fixed non-zero literal — then it is a constant rescale and
        # the numerator's interval carries over.
        ch = expr.children()
        if ch.length() == 2:
            div = ch.apply(1)
            if div.getClass().getSimpleName() == "Literal":
                try:
                    v = div.value()
                    if v is not None and float(str(v)) != 0.0:
                        return _expr_interval(ch.apply(0), defs, depth + 1)
                except Exception:  # noqa: BLE001 - non-numeric literal
                    pass
        return (False, False)
    ch = expr.children()
    if ch.length() == 0:
        return (False, False)
    # componentwise via _expr_interval, NOT the top-level gate: the
    # result-type discreteness check applies only to the grouping
    # expression as a whole (a string literal INSIDE a computation —
    # e.g. a named_struct field name — is a 1-value domain, fine)
    if all(
        _expr_interval(ch.apply(i), defs, depth + 1) == (True, True)
        for i in range(ch.length())
    ):
        return (True, True)
    return (False, False)


def _aggregate_bounded(node, is_bounded) -> bool:
    """Aggregate output cardinality structurally bounded: empty grouping
    (1 row), all grouping expressions bounded, or input already bounded
    (groupBy over a Limit cannot exceed the limit)."""
    ge = node.groupingExpressions()
    if ge.isEmpty():
        return True
    defs: dict = {}
    _collect_alias_defs(node, defs)
    if all(
        _bounded_grouping_expr(ge.apply(i), defs) for i in range(ge.length())
    ):
        return True
    ch = node.children()
    return all(is_bounded(ch.apply(i)) for i in range(ch.length()))


def unpartitioned_window_violations(df: DataFrame) -> list[str]:
    """Unpartitioned logical Window nodes whose input is not
    structurally BOUNDED — i.e. single-task sorts over potentially
    corpus-sized input.

    An unpartitioned window funnels its whole input through one task;
    that is only acceptable when the input is already an aggregate
    (bounded by groups x shards / buckets x capacity rows by
    construction — the sharded-prefix-sum pass-1 offset shape).  Spark
    itself flags every unpartitioned window with the WindowExec "No
    Partition Defined" WARNING regardless of input size (see README);
    this check separates the benign bounded ones from a real scale
    bug creeping in.  Returns the offending nodes' simpleStrings
    (empty list = plan is clean).

    "Bounded" is judged on the window's INPUT path, not by the mere
    presence of an Aggregate anywhere beneath it (a join of a broadcast
    1-row stats aggregate onto the raw corpus — the sharded-prefix-sum
    min/max pattern — CONTAINS an Aggregate yet is as unbounded as the
    corpus): Limit / literal relations are bounded; a Join or Union is
    bounded only if EVERY branch is; pass-through unary nodes inherit
    their child; a leaf scan is unbounded.

    An Aggregate is bounded only when its OUTPUT cardinality is
    structurally bounded (ADVICE r9: "any Aggregate is bounded" let a
    groupBy(doc_id) identity grouping — corpus-sized — pass): grouping
    empty (1 row), every grouping expression bounded per
    ``_bounded_grouping_expr`` (literal-clamped bucket / modulo-by-
    literal / time-bucket shapes), or the aggregate's own input already
    bounded.  Residual limitation (documented, not closed): the
    classifier is structural, so a genuinely low-cardinality RAW column
    (groupBy(lang)) is indistinguishable from groupBy(doc_id) and is
    flagged — a deliberate single-task trade over such a grouping gets
    an explicit waiver at the call site (tests/test_plans.py WAIVED),
    never a silent pass.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    violations: list[str] = []

    def is_bounded(node) -> bool:
        name = node.getClass().getSimpleName()
        if name == "Aggregate":
            return _aggregate_bounded(node, is_bounded)
        if "Limit" in name:
            return True
        if name in ("LocalRelation", "OneRowRelation"):
            return True
        ch = node.children()
        if ch.length() == 0:
            return False  # leaf scan / relation: corpus-sized
        # Join/Union bounded iff ALL branches bounded; unary
        # pass-throughs (Project/Filter/Sort/Window/...) inherit the
        # child — the same all() expresses both
        return all(is_bounded(ch.apply(i)) for i in range(ch.length()))

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Window" and node.partitionSpec().isEmpty():
            ch = node.children()
            if not all(is_bounded(ch.apply(i)) for i in range(ch.length())):
                violations.append(node.simpleString(120))
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(plan)
    return violations


def assert_partial_aggregation(df: DataFrame) -> None:
    """Aggregation has a map-side partial pass (partial before final) —
    the thing that keeps a 2x-duplicated 100 TB stream from shuffling
    every row."""
    plan = physical_plan(df)
    has_partial = (
        "partial_" in plan
        or re.search(r"HashAggregate.*\n(.|\n)*HashAggregate", plan) is not None
    )
    assert has_partial, f"no partial aggregation found:\n{plan[:2000]}"
