from transitdata_hfp_deduplicator_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_broadcast_join,
    assert_no_cartesian,
    assert_partial_aggregation,
    assert_pushed_filter,
    physical_plan,
    read_schema_columns,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_broadcast_join",
    "assert_no_cartesian",
    "assert_partial_aggregation",
    "assert_pushed_filter",
    "physical_plan",
    "read_schema_columns",
]
