from transitdata_hfp_deduplicator_spark.streaming.runner import (
    parquet_stream,
    run_to_memory,
)
from transitdata_hfp_deduplicator_spark.streaming.dedup_stream import stream_dedup
from transitdata_hfp_deduplicator_spark.streaming.analytics import (
    stream_dup_stats,
    with_alerts,
)

__all__ = [
    "parquet_stream",
    "run_to_memory",
    "stream_dedup",
    "stream_dup_stats",
    "with_alerts",
]
