"""Custom Python DataSource (`format("hfp_text")`): split-boundary
correctness against the column-expression parser, golden corpus parity.
"""

from __future__ import annotations

import pytest

from transitdata_hfp_deduplicator_spark.sources.hfp import read_corpus
from transitdata_hfp_deduplicator_spark.sources.hfp_datasource import (
    HfpTextDataSource,
    parse_hfp_line,
)

CORPUS = "/root/reference/src/integration-test/resources/hfp-5000.txt"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(HfpTextDataSource)


def _load(spark, **opts):
    r = spark.read.format("hfp_text").option("path", CORPUS)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_reads_all_lines(spark):
    assert _load(spark).count() == 5000


def test_matches_column_expression_parser(spark):
    """The DataSource rows equal hfp.parse_lines' output exactly —
    two independent implementations of ITDeduplicatorTest.java:138-148."""
    via_ds = set(map(tuple, _load(spark).collect()))
    via_expr = set(map(tuple, read_corpus(spark, CORPUS).collect()))
    assert via_ds == via_expr


@pytest.mark.parametrize("n", [1, 3, 7, 32])
def test_split_boundaries_lose_nothing(spark, n):
    """Any byte-range split count yields the same 5000 rows — the
    partial-line ownership rule at work (a wrong rule drops or
    duplicates boundary lines)."""
    df = _load(spark, numPartitions=str(n))
    assert df.count() == 5000


def test_golden_unique_count_through_datasource(spark):
    """The reference's golden oracle (5000 → 4956 uniques by
    topic + ' ' + payload, ITDeduplicatorTest.java:80-93) through the
    custom format."""
    df = _load(spark)
    assert df.select("topic", "payload").distinct().count() == 4956


def test_parse_rule_degrades_gracefully():
    assert parse_hfp_line("noseparator") == ("noseparator", "", "")
    ts, topic, payload = parse_hfp_line('t /a/b {"x": 1}')
    assert (ts, topic, payload) == ("t", "/a/b", '{"x": 1}')
    # topic with spaces: json starts at first '{'
    ts, topic, payload = parse_hfp_line('t /a b c {"x": 1}')
    assert topic == "/a b c"
