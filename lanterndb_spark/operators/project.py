"""Embedding dimensionality reduction: seeded random projection + sampled PCA.

The reference stores and searches vectors at their model dimension; its
only dimension-changing machinery is PQ (codebook compression,
``operators/pq.py``). Training-data pipelines additionally want *linear*
reduction — Johnson-Lindenstrauss random projection for cheap
distance-preserving sketches, PCA for variance-optimal compaction before
clustering/indexing — so this module adds both, Spark-first
(SURVEY §7.8 extension, same posture as dedup/curate).

Scale shape (mirrors ``operators/ivf.py``):

- FIT is one bounded random sample + a driver-side numpy eigh — training
  on a sample is the standard recipe (the reference bounds codebook
  training identically via ``dataset_size_limit``, lantern.sql:196); a
  full-data distributed PCA would scan 100 TB per power iteration for no
  measurable quality gain at these output ranks.
- APPLY is embarrassingly parallel: the (in_dim × out_dim) matrix — a
  few hundred KB at embedding scale — ships in the Arrow-batched pandas
  UDF closure, and each batch is one ``numpy`` matmul. No shuffle; the
  projection rides whatever scan or exchange the plan already has.
- Gaussian projection needs no fit at all: the matrix is regenerated
  from ``(seed, in_dim, out_dim)`` on every executor, so nothing is
  broadcast and two runs (or two engines) agree bit-for-bit.

JL sizing note for callers: distortion eps over n points needs roughly
``out_dim >= 8 ln(n) / eps^2``; the q_projection_invariants oracle pins
an empirical bound at the bench dimensions.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gaussian_projection(in_dim: int, out_dim: int, seed: int = 42) -> np.ndarray:
    """(in_dim, out_dim) float32 JL matrix: iid N(0, 1/out_dim) from a
    fixed-seed RandomState — deterministic across runs and executors."""
    rs = np.random.RandomState(seed)
    return (
        rs.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)
    ).astype(np.float32)


def _matmul_udf(mat: np.ndarray, mean: np.ndarray | None = None):
    """array<float> -> array<float> pandas UDF: one numpy matmul per
    Arrow batch ([optionally centered] X @ mat)."""

    @F.pandas_udf("array<float>")
    def _proj(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float32) for v in vs])
        if mean is not None:
            X = X - mean
        Y = X @ mat
        return pd.Series(list(Y.astype(np.float32)))

    return _proj


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Dimension of the first non-null vector (one 1-row job)."""
    row = df.select(F.size(vec_col).alias("d")).filter(F.col("d") > 0).first()
    if row is None:
        raise ValueError(f"no non-empty vectors in column {vec_col!r}")
    return int(row["d"])


def project_embeddings(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 42,
    out_col: str = "proj",
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss reduction: append ``out_col`` =
    ``vec @ gaussian_projection(in_dim, out_dim, seed)``. Pure map — no
    shuffle, no fit, deterministic from the seed alone."""
    d = in_dim if in_dim is not None else infer_dim(df, vec_col)
    return df.withColumn(
        out_col, _matmul_udf(gaussian_projection(d, out_dim, seed))(F.col(vec_col))
    )


class PcaModel(NamedTuple):
    """Sampled-PCA fit: ``components`` is (in_dim, out_dim) orthonormal,
    columns ordered by descending ``explained_variance``; signs are
    canonicalized (largest-|loading| entry positive) so the fit is
    deterministic up to LAPACK, not up to ±column flips."""

    mean: np.ndarray
    components: np.ndarray
    explained_variance: np.ndarray


def pca_fit(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    sample_limit: int = 100_000,
    seed: int = 42,
) -> PcaModel:
    """Top-``out_dim`` principal directions of a bounded random sample
    (one scan + driver-side eigh of the (d × d) covariance — d is the
    embedding dim, so the driver work is microscopic)."""
    from lanterndb_spark.plans.shape import bounded_rand_sample

    # driver-safe sample (see bounded_rand_sample: the old
    # orderBy(rand).limit idiom blows maxResultSize at 50M+ rows)
    rows = bounded_rand_sample(
        df.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull()),
        sample_limit, seed,
    )
    if len(rows) < 2:
        raise ValueError("pca_fit needs at least 2 sample vectors")
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    mean = X.mean(axis=0)
    Xc = X - mean
    cov = (Xc.T @ Xc) / (len(X) - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:out_dim]
    comps = vecs[:, order].copy()
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return PcaModel(mean, comps, np.maximum(vals[order], 0.0))


def pca_project(
    df: DataFrame, vec_col: str, model: PcaModel, out_col: str = "proj"
) -> DataFrame:
    """Append ``out_col`` = ``(vec - mean) @ components``. Same
    embarrassingly-parallel matmul as :func:`project_embeddings`."""
    return df.withColumn(
        out_col,
        _matmul_udf(
            model.components.astype(np.float32), model.mean.astype(np.float32)
        )(F.col(vec_col)),
    )


def pca_reconstruction_error(
    df: DataFrame, vec_col: str, model: PcaModel
) -> float:
    """Mean squared L2 reconstruction error of projecting onto the model
    and mapping back (components are orthonormal, so the inverse map is
    the transpose). One aggregate job — used by validation/invariants."""
    comps = model.components.astype(np.float32)
    mean = model.mean.astype(np.float32)

    @F.pandas_udf("double")
    def _err(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=float)
        X = np.stack([np.asarray(v, dtype=np.float32) for v in vs]) - mean
        R = (X @ comps) @ comps.T
        return pd.Series(((X - R) ** 2).sum(axis=1).astype(np.float64))

    out = df.select(_err(F.col(vec_col)).alias("e")).agg(F.avg("e").alias("mse"))
    return float(out.first()["mse"])


def projected_knn(
    df: DataFrame,
    vec_col: str,
    query,
    k: int = 10,
    out_dim: int = 16,
    seed: int = 42,
    oversample: int = 8,
    id_col: str | None = None,
    dist_col: str = "dist",
    model: PcaModel | None = None,
    proj_col: str | None = None,
) -> DataFrame:
    """Two-stage ANN via linear reduction: coarse top-``k*oversample`` by
    l2sq in the projected space, exact full-dimension rerank of the
    survivors — the linear sibling of PQ's ADC search
    (``operators/pq.py``; reference ADC in lantern_extras quantizes, this
    projects). JL preserves l2 up to the distortion bound pinned by
    q_projection_invariants, so modest oversampling recovers the exact
    top-k with high probability; ``oversample`` is the recall/cost knob
    (autotune-style sweeps apply, operators/autotune.py).

    Scale shape: both stages are TakeOrderedAndProject (bounded per-task
    heaps, no global sort); the full-dimension vectors of only
    ``k*oversample`` rows are ever compared exactly. With
    ``proj_col``/``model`` supplied, the projection is read precomputed
    (write it once with :func:`project_embeddings` /
    :func:`pca_project`) and the coarse scan never touches the wide
    column at all — at 100 TB, store the projection alongside the
    vectors and let column pruning skip the full-dim column until
    rerank.

    WHEN IT HELPS (measured): the coarse filter ranks well exactly when
    the embeddings have intrinsic low-dimensional structure — real-model
    embeddings do; on ISOTROPIC vectors (this repo's iid-gaussian
    synthetic corpus) pairwise distances concentrate and the projected
    ranking decorrelates (corr 0.41 at 64→16 on the sf0.001 table), so
    prefer IVF/SQ there. For anisotropic data, fit ``model`` with
    :func:`pca_fit` (variance-optimal); validate a chosen ``oversample``
    with an exact-recall sweep (operators/autotune.py pattern) before
    relying on it — q_projknn_invariants pins exactness on structured
    data and the rerank/subset contract on the raw corpus."""
    from lanterndb_spark.functions.distance import l2sq_dist, query_vec

    q = np.asarray(list(query), dtype=np.float32)
    if model is not None:
        qp = (q - model.mean.astype(np.float32)) @ model.components.astype(
            np.float32
        )
        base = df if proj_col else pca_project(df, vec_col, model, "__proj")
    else:
        qp = q @ gaussian_projection(len(q), out_dim, seed)
        base = (
            df
            if proj_col
            else project_embeddings(
                df, vec_col, out_dim, seed, "__proj", in_dim=len(q)
            )
        )
    pc = proj_col or "__proj"
    tie = [F.col(id_col).asc()] if id_col else []
    cand = (
        base.withColumn(
            "__pdist", l2sq_dist(F.col(pc), query_vec([float(x) for x in qp]))
        )
        .orderBy(F.col("__pdist").asc(), *tie)
        .limit(k * oversample)
    )
    out = (
        cand.withColumn(
            # rerank against the RAW query values (the float32 cast is for
            # the coarse matmul only) so results are bit-equal to knn()
            dist_col,
            l2sq_dist(F.col(vec_col), query_vec([float(x) for x in query])),
        )
        .orderBy(F.col(dist_col).asc(), *tie)
        .limit(k)
        .drop("__pdist")
    )
    return out if proj_col else out.drop("__proj")


class ProjIndex(NamedTuple):
    """Projection 'index' artifact for LanternTable routing: the table
    with its precomputed narrow column (``__proj``), plus everything
    needed to project queries and late-arriving rows identically."""

    projected: DataFrame
    model: PcaModel | None  # None = seeded JL
    out_dim: int
    seed: int
    vec_col: str


def build_proj(
    df: DataFrame,
    vec_col: str,
    out_dim: int = 16,
    method: str = "jl",
    seed: int = 42,
    sample_limit: int = 100_000,
) -> ProjIndex:
    """CREATE INDEX analogue for the projected two-stage search: fit (PCA)
    or derive (JL) the matrix and materialize the narrow column."""
    if method == "pca":
        model = pca_fit(df, vec_col, out_dim, sample_limit=sample_limit, seed=seed)
        projected = pca_project(df, vec_col, model, "__proj")
    elif method == "jl":
        model = None
        projected = project_embeddings(df, vec_col, out_dim, seed, "__proj")
    else:
        raise ValueError(f"unknown projection method {method!r}")
    return ProjIndex(projected, model, out_dim, seed, vec_col)


def proj_apply(index: ProjIndex, df: DataFrame) -> DataFrame:
    """Project late-arriving rows with the INDEX's matrix (aminsert
    analogue — no refit, same map as the base table)."""
    if index.model is not None:
        return pca_project(df, index.vec_col, index.model, "__proj")
    return project_embeddings(
        df, index.vec_col, index.out_dim, index.seed, "__proj"
    )


def projected_knn_batch(
    index: ProjIndex,
    queries: list,
    k: int = 10,
    oversample: int = 8,
    id_col: str = "id",
) -> DataFrame:
    """Batch form of :func:`projected_knn` over a built :func:`build_proj`
    index — one distributed job for ALL queries (mirrors
    ``ivf_search_batch``): queries are projected driver-side with the
    index's matrix, the coarse stage is one ``knn_join`` against the
    NARROW column (Arrow matmul path — the wide column is never touched),
    and the exact rerank re-joins only the ``k*oversample`` survivors per
    query back to their full vectors. Returns ``(q_id, id_col, dist)``,
    per-query top-k by exact full-dimension l2sq."""
    from pyspark.sql import Window

    from lanterndb_spark.operators.knn import knn_join

    spark = index.projected.sparkSession
    Q = np.array([list(q) for q in queries], dtype=np.float32)
    if index.model is not None:
        QP = (Q - index.model.mean.astype(np.float32)) @ index.model.components.astype(
            np.float32
        )
    else:
        QP = Q @ gaussian_projection(Q.shape[1], index.out_dim, index.seed)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in QP[i]]) for i in range(len(queries))],
        "q_id int, __qp array<float>",
    )
    coarse = knn_join(
        index.projected.select(id_col, "__proj"),
        "__proj",
        qdf,
        "__qp",
        k=k * oversample,
        id_col=id_col,
        unique_q_ids=True,  # enumerate() mints them
    ).select("q_id", id_col)
    full_q = spark.createDataFrame(
        [(i, [float(x) for x in queries[i]]) for i in range(len(queries))],
        "q_id int, __qv array<float>",
    )
    from lanterndb_spark.functions.distance import l2sq_dist

    rer = (
        coarse.join(index.projected.drop("__proj"), on=id_col)
        .join(F.broadcast(full_q), on="q_id")
        .withColumn("dist", l2sq_dist(F.col(index.vec_col), F.col("__qv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        rer.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("q_id", id_col, "dist")
        .orderBy("q_id", "dist", id_col)
    )
