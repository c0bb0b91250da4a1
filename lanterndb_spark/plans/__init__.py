from lanterndb_spark.plans.shape import explode_nonempty, widen_partitions

__all__ = ["explode_nonempty", "widen_partitions"]
