"""Semantic cluster balancing — embedding-space diversity caps.

Web-scale corpora are lumpy in embedding space: a few semantic modes
(boilerplate, SEO spam, one dominant topic) hold most of the mass.
Cluster balancing k-means-partitions the corpus by embedding and caps
each cluster's contribution, the embedding-space analogue of C4's
per-domain caps (operators/sampling.py cap_per_group) — the shape used
by dedup/diversity stages in DoReMi/D4-style data curation.

Composition, not new machinery:

- coarse clusters come from operators/ivf.py build_ivf (sample-trained
  k-means, broadcast-centroid Arrow argmin assignment — the one
  full-data pass is embarrassingly parallel);
- the cap is operators/sampling.py cap_per_group (WindowGroupLimit:
  map-side per-cluster top-``quota`` heaps run before the single
  shuffle on cluster_id).

At 100 TB: one bounded sample collect, one projection, one capped
shuffle. The k-means fit is driver-side numpy on <=50k rows regardless
of corpus size.

Reference: no such surface; the nearest kin is IVF centroid training
(lantern.sql:196 dataset_size_limit), reused here verbatim via
build_ivf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.ivf import build_ivf
from lanterndb_spark.operators.sampling import cap_per_group


def cluster_balance(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    quota: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Rows surviving the per-cluster cap: input columns + ``cluster_id``.

    Deterministic: k-means is seeded, the kept rows are the ``quota``
    lowest-``id_col`` rows of each cluster.
    """
    assigned = build_ivf(df, vec_col, nlist=nlist, seed=seed).assigned
    return cap_per_group(assigned, "cluster_id", id_col, quota)


def cluster_balance_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    quota: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Per-cluster audit of the same pass: ``cluster_id, n_total,
    n_kept, quota_ok`` where ``quota_ok`` asserts IN-QUERY that the cap
    held exactly (``n_kept == least(n_total, quota)``) — the
    bloom_hot_terms pattern for driver-checkable invariants when the
    k-means assignment itself is not SQL-reproducible."""
    assigned = build_ivf(df, vec_col, nlist=nlist, seed=seed).assigned
    kept = cap_per_group(assigned, "cluster_id", id_col, quota)
    totals = assigned.groupBy("cluster_id").agg(F.count("*").cast("int").alias("n_total"))
    kepts = kept.groupBy("cluster_id").agg(F.count("*").cast("int").alias("n_kept"))
    return (
        totals.join(kepts, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            (
                F.coalesce("n_kept", F.lit(0))
                == F.least(F.col("n_total"), F.lit(int(quota)))
            ).alias("quota_ok"),
        )
        .orderBy("cluster_id")
    )
