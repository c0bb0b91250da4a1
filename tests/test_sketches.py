"""Sketch aggregates: mergeability, error bounds, and plan shape.

The load-bearing property is rollup losslessness: a union of fine-grained
HLL states must give the SAME estimate as one pass over the raw data —
that's what lets a 100 TB pipeline build sketches once and answer every
coarser grain from kilobytes. Error-bound tests run at a cardinality
(100k) where approximation is real, not vacuously exact.
"""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.functions.sketches import (
    approx_quantiles,
    cms_build,
    cms_estimate,
    heavy_hitters,
    hll_distinct,
    hll_rollup,
    hll_sketches,
)


@pytest.fixture(scope="module")
def big(spark):
    # 400k rows, 100k distinct users, 8 shards, skewed value distribution
    return (
        spark.range(400_000)
        .select(
            (F.col("id") % 100_000).alias("user_id"),
            (F.col("id") % 8).alias("shard"),
            (F.xxhash64("id") % 1000).cast("double").alias("value"),
            F.when(F.col("id") % 3 == 0, "hot").otherwise(
                F.concat(F.lit("u"), (F.col("id") % 50).cast("string"))
            ).alias("tag"),
        )
        .persist()
    )


def test_hll_rollup_does_not_drift(big):
    """union(per-shard sketches) must stay within sketch error of both the
    single-pass estimate and the truth — sparse->dense promotion during
    union may shift the estimator slightly, but never past the RSE."""
    direct = hll_distinct(big.withColumn("g", F.lit(1)), "g", "user_id")
    rolled = hll_rollup(hll_sketches(big, "shard", "user_id"), [F.lit(1).alias("g")])
    d = direct.collect()[0]["n_distinct_est"]
    r = rolled.collect()[0]["n_distinct_est"]
    assert abs(d - r) / d < 0.02
    assert abs(r - 100_000) / 100_000 < 0.05


def test_hll_estimate_within_rse(big):
    """lgk=12 -> RSE ~1.6%%; allow 3 sigma on 100k true distinct."""
    est = hll_distinct(big.withColumn("g", F.lit(1)), "g", "user_id").collect()[0][
        "n_distinct_est"
    ]
    assert abs(est - 100_000) / 100_000 < 0.05


def test_hll_sketch_state_is_small(big):
    """The whole point: per-group state is KBs, not the data."""
    row = hll_sketches(big, "shard", "user_id").select(
        F.max(F.length("sketch")).alias("sz")
    ).collect()[0]
    assert row["sz"] < 16_384  # 2^12 registers and change


def test_cms_overestimates_within_bound(spark, big):
    n = big.count()
    eps = 0.001
    sk = cms_build(big, "tag", eps=eps, confidence=0.99)
    exact = {r["tag"]: r["n"] for r in big.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    est = cms_estimate(spark, sk, list(exact))
    for tag, true_n in exact.items():
        assert est[tag] >= true_n  # CMS never underestimates
        assert est[tag] <= true_n + eps * n  # w.p. confidence


def test_heavy_hitters_exact(big):
    top = heavy_hitters(big, "tag", k=1).collect()
    assert top[0]["tag"] == "hot"
    assert top[0]["n"] == big.filter(F.col("tag") == "hot").count()


def test_approx_quantile_rank_error(big):
    """approx p50 must sit within rank 0.5 +/- 1/accuracy (+ tie slack)."""
    acc = 10_000
    q = approx_quantiles(big, "shard", "value", probs=(0.5,), accuracy=acc)
    joined = big.join(F.broadcast(q), "shard")
    ranks = (
        joined.groupBy("shard", "q_50")
        .agg((F.sum((F.col("value") <= F.col("q_50")).cast("int")) / F.count("*")).alias("r"))
        .collect()
    )
    for row in ranks:
        assert row["r"] >= 0.5 - 1.0 / acc - 0.01
        # upper side is loose: ties on the quantile value inflate <=-rank


def test_hll_agg_has_mapside_partial(big):
    """The sketch agg must be a two-phase hash aggregate (partial on the
    map side, merge after the shuffle) — a single-phase agg would ship
    every raw row across the network."""
    plan = hll_distinct(big, "shard", "user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") >= 2
