from transitdata_hfp_deduplicator_spark.operators.dedup import (
    dedup_exact,
    dup_stats_tumbling,
    payload_digest,
)

__all__ = ["dedup_exact", "dup_stats_tumbling", "payload_digest"]
