from lanterndb_spark.sources.vecs import read_bvecs, read_fvecs, read_ivecs

__all__ = ["read_fvecs", "read_ivecs", "read_bvecs"]
