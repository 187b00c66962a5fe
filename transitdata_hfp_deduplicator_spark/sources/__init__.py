from transitdata_hfp_deduplicator_spark.sources import envelope, hfp

__all__ = ["envelope", "hfp"]
