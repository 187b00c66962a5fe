from transitdata_hfp_deduplicator_spark.functions import text, vectors

__all__ = ["text", "vectors"]
