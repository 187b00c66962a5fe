from transitdata_hfp_deduplicator_spark.streaming.runner import (
    allow_chained_stateful,
    ephemeral_dir,
    parquet_stream,
    replay_shuffle_partitions,
    run_to_memory,
    scoped_conf,
    scoped_shuffle_partitions,
)
from transitdata_hfp_deduplicator_spark.streaming.dedup_stream import stream_dedup
from transitdata_hfp_deduplicator_spark.streaming.neardup_stream import (
    neardup_tag_stream,
)
from transitdata_hfp_deduplicator_spark.streaming.analytics import (
    stream_dup_stats,
    with_alerts,
)

__all__ = [
    "allow_chained_stateful",
    "ephemeral_dir",
    "parquet_stream",
    "scoped_conf",
    "replay_shuffle_partitions",
    "neardup_tag_stream",
    "run_to_memory",
    "scoped_shuffle_partitions",
    "stream_dedup",
    "stream_dup_stats",
    "with_alerts",
]
