"""Bucketed-layout writes (sinks.write_bucketed): the co-located-join
story for 100 TB fact tables — shuffle once at write time, never at
read time.

The plan assertions here are the point: a join or aggregation keyed on
the bucket column over a bucketed table must contain NO Exchange on
that side (Spark's bucketing contract), and with sortBy not even a
Sort.  At cluster scale this is the difference between re-shuffling a
100 TB dedup index on every incremental batch and reading it in place.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from transitdata_hfp_deduplicator_spark.operators.dedup import payload_digest
from transitdata_hfp_deduplicator_spark.plans import physical_plan
from transitdata_hfp_deduplicator_spark.sinks import write_bucketed
from transitdata_hfp_deduplicator_spark.tables import table


@pytest.fixture(scope="module")
def bucketed_index(spark, sf_dir):
    """A digest-bucketed historical dedup index + a digest-bucketed
    second table, both 8 buckets on `digest`."""
    ev = table(spark, sf_dir, "events").select(
        payload_digest("user_id", "event_type", "props").alias("digest"),
        "user_id",
        "event_type",
    )
    hist = ev.filter(F.col("user_id") % 2 == 0)
    new = ev.filter(F.col("user_id") % 2 == 1)
    write_bucketed(hist, "hist_index", ["digest"], n_buckets=8, sort_cols=["digest"])
    write_bucketed(new, "new_batch", ["digest"], n_buckets=8, sort_cols=["digest"])
    yield spark.table("hist_index"), spark.table("new_batch")
    spark.sql("DROP TABLE IF EXISTS hist_index")
    spark.sql("DROP TABLE IF EXISTS new_batch")


def test_bucketed_join_no_exchange(bucketed_index, spark):
    """Equi-join of two same-bucketed tables: zero ShuffleExchanges —
    both sides read in place.  At test scale the planner would rather
    broadcast the tiny table (which also bypasses bucketing), so scope
    the broadcast threshold off to plan the way a 100 TB index would."""
    from transitdata_hfp_deduplicator_spark.streaming.runner import scoped_conf

    hist, new = bucketed_index
    with scoped_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        j = new.join(hist.select("digest"), "digest", "left_anti")
        plan = physical_plan(j)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_agg_no_exchange(bucketed_index):
    """groupBy on the bucket key aggregates in place — no shuffle."""
    hist, _ = bucketed_index
    agg = hist.groupBy("digest").agg(F.count(F.lit(1)).alias("n"))
    plan = physical_plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_anti_join_matches_unbucketed(bucketed_index, spark, sf_dir):
    """Layout must not change semantics: the bucketed anti-join returns
    the same digests as the plain one."""
    hist, new = bucketed_index
    got = sorted(
        r.digest
        for r in new.join(hist.select("digest"), "digest", "left_anti")
        .select("digest")
        .distinct()
        .collect()
    )
    ev = table(spark, sf_dir, "events").select(
        payload_digest("user_id", "event_type", "props").alias("digest"),
        "user_id",
    )
    want = sorted(
        r.digest
        for r in ev.filter(F.col("user_id") % 2 == 1)
        .join(
            ev.filter(F.col("user_id") % 2 == 0).select("digest"),
            "digest",
            "left_anti",
        )
        .select("digest")
        .distinct()
        .collect()
    )
    assert got == want
