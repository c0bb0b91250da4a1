"""Cluster balancing: caps hold, determinism, composition with IVF."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.balance import cluster_balance, cluster_balance_stats


def test_caps_hold_and_keep_lowest_ids(spark, tables):
    emb = tables["embeddings"]
    kept = cluster_balance(emb, nlist=4, quota=10)
    per = kept.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    assert per and all(r["n"] <= 10 for r in per)
    # kept rows are the lowest vec_ids of their cluster: re-deriving the
    # cap from the full assignment gives the same id set
    from lanterndb_spark.operators.ivf import build_ivf
    from lanterndb_spark.operators.sampling import cap_per_group

    assigned = build_ivf(emb, "embedding", nlist=4, seed=42).assigned
    expect = {r["vec_id"] for r in cap_per_group(assigned, "cluster_id", "vec_id", 10).collect()}
    assert {r["vec_id"] for r in kept.collect()} == expect


def test_stats_invariants_all_true(spark, tables):
    stats = cluster_balance_stats(tables["embeddings"], nlist=4, quota=10).collect()
    assert stats
    assert all(r["quota_ok"] for r in stats)
    assert all(r["n_kept"] == min(r["n_total"], 10) for r in stats)


def test_deterministic_across_runs(spark, tables):
    emb = tables["embeddings"]
    a = sorted(r["vec_id"] for r in cluster_balance(emb, nlist=4, quota=5).collect())
    b = sorted(r["vec_id"] for r in cluster_balance(emb, nlist=4, quota=5).collect())
    assert a == b
