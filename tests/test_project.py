"""Dimensionality reduction: determinism, JL distortion, PCA optimality."""

import numpy as np
from pyspark.sql import functions as F

from lanterndb_spark.operators.project import (
    gaussian_projection,
    pca_fit,
    pca_project,
    pca_reconstruction_error,
    project_embeddings,
)


def _vectors(spark, n=200, d=32, seed=7):
    rs = np.random.RandomState(seed)
    # anisotropic data so PCA has real structure to find
    scales = np.linspace(3.0, 0.1, d)
    X = rs.standard_normal((n, d)) * scales
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, emb array<float>"), X


def test_gaussian_projection_deterministic(spark):
    a = gaussian_projection(32, 8, seed=1)
    b = gaussian_projection(32, 8, seed=1)
    c = gaussian_projection(32, 8, seed=2)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)

    df, _ = _vectors(spark)
    p1 = project_embeddings(df, "emb", 8, seed=1).select("id", "proj").collect()
    p2 = project_embeddings(df, "emb", 8, seed=1).select("id", "proj").collect()
    assert {r["id"]: list(r["proj"]) for r in p1} == {
        r["id"]: list(r["proj"]) for r in p2
    }


def test_jl_distortion_bounded(spark):
    df, X = _vectors(spark, n=100, d=32)
    out = {
        r["id"]: np.asarray(r["proj"])
        for r in project_embeddings(df, "emb", 16, seed=3).collect()
    }
    rs = np.random.RandomState(0)
    ratios = []
    for _ in range(200):
        i, j = rs.randint(0, 100, 2)
        if i == j:
            continue
        d0 = np.linalg.norm(X[i] - X[j])
        d1 = np.linalg.norm(out[i] - out[j])
        ratios.append(d1 / d0)
    ratios = np.array(ratios)
    # E[ratio^2]=1; at out_dim=16 the empirical spread stays well inside
    # [0.3, 1.9] and the mean near 1
    assert 0.3 < ratios.min() and ratios.max() < 1.9
    assert abs(float(np.mean(ratios**2)) - 1.0) < 0.35


def test_pca_orthonormal_ordered_and_beats_random(spark):
    df, X = _vectors(spark, n=300, d=32)
    model = pca_fit(df, "emb", out_dim=8, sample_limit=10_000, seed=42)
    G = model.components
    assert G.shape == (32, 8)
    assert np.allclose(G.T @ G, np.eye(8), atol=1e-8)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))

    # PCA is the optimal rank-8 linear reconstruction: must beat the
    # gaussian projection's least-squares reconstruction on the same data
    pca_mse = pca_reconstruction_error(df, "emb", model)
    R = gaussian_projection(32, 8, seed=5).astype(np.float64)
    Xc = X - X.mean(axis=0)
    Y = Xc @ R
    back = Y @ np.linalg.pinv(R)
    rand_mse = float(((Xc - back) ** 2).sum(axis=1).mean())
    assert pca_mse < rand_mse


def test_pca_project_matches_numpy(spark):
    df, X = _vectors(spark, n=120, d=16)
    model = pca_fit(df, "emb", out_dim=4, sample_limit=10_000, seed=1)
    got = {
        r["id"]: np.asarray(r["proj"], dtype=np.float64)
        for r in pca_project(df, "emb", model).collect()
    }
    Xf = X.astype(np.float32)
    expect = (
        Xf - model.mean.astype(np.float32)
    ) @ model.components.astype(np.float32)
    for i in range(120):
        assert np.allclose(got[i], expect[i], atol=1e-4)


def test_projection_preserves_other_columns(spark):
    df, _ = _vectors(spark, n=10, d=8)
    out = project_embeddings(df, "emb", 4, seed=9)
    assert set(out.columns) == {"id", "emb", "proj"}
    assert out.filter(F.size("proj") != 4).count() == 0


def test_projected_knn_exact_on_structured_data(spark):
    from lanterndb_spark.operators.knn import knn
    from lanterndb_spark.operators.project import pca_fit, projected_knn

    rs = np.random.RandomState(3)
    # intrinsic dimension ~6 inside a 32-dim space: the PCA coarse filter
    # must make the two-stage search exact at modest oversample
    B = rs.standard_normal((6, 32))
    Z = rs.standard_normal((400, 6)) @ B + 0.01 * rs.standard_normal((400, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in Z[i]]) for i in range(400)],
        "vec_id long, emb array<float>",
    )
    q = [float(x) for x in Z[5]]
    exact = [
        (r["vec_id"], round(r["dist"], 5))
        for r in knn(df, "emb", q, k=10, id_col="vec_id").collect()
    ]
    model = pca_fit(df, "emb", out_dim=8, sample_limit=10_000, seed=1)
    got = [
        (r["vec_id"], round(r["dist"], 5))
        for r in projected_knn(
            df, "emb", q, k=10, oversample=4, id_col="vec_id", model=model
        ).collect()
    ]
    assert got == exact


def test_projected_knn_subset_and_exact_rerank(spark):
    from lanterndb_spark.functions.distance import l2sq_dist, query_vec
    from lanterndb_spark.operators.project import projected_knn

    df, X = _vectors(spark, n=150, d=32)
    q = [float(x) for x in X[0]]
    out = projected_knn(df, "emb", q, k=5, oversample=4, id_col="id")
    rows = out.collect()
    assert len(rows) == 5
    # rerank distances are EXACT full-dimension l2sq regardless of the
    # coarse stage's quality
    for r in rows:
        d = float(np.sum((np.asarray(r["emb"], dtype=np.float32) - np.asarray(q, dtype=np.float32)) ** 2))
        assert abs(r["dist"] - d) < 1e-3
    # distances ascend
    ds = [r["dist"] for r in rows]
    assert ds == sorted(ds)


def test_autotune_projknn_on_structured_data(spark):
    from lanterndb_spark.operators.autotune import autotune_projknn

    rs = np.random.RandomState(11)
    B = rs.standard_normal((6, 32))
    Z = rs.standard_normal((300, 6)) @ B + 0.01 * rs.standard_normal((300, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in Z[i]]) for i in range(300)],
        "vec_id long, emb array<float>",
    )
    best, grid = autotune_projknn(
        df, "emb", "vec_id", k=5, out_dim_grid=(8,), oversample_grid=(2, 8),
        n_queries=4, target_recall=0.9, method="pca", seed=2,
    )
    assert len(grid) == 2
    by_os = {r.params["oversample"]: r.recall for r in grid}
    # wider rerank can only help on average; structured data reaches target
    assert by_os[8] >= by_os[2]
    assert best is not None and best.recall >= 0.9


def test_projected_knn_batch_matches_single(spark):
    from lanterndb_spark.operators.knn import knn
    from lanterndb_spark.operators.project import build_proj, projected_knn_batch

    rs = np.random.RandomState(21)
    B = rs.standard_normal((6, 32))
    Z = rs.standard_normal((250, 6)) @ B + 0.01 * rs.standard_normal((250, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in Z[i]]) for i in range(250)],
        "vec_id long, emb array<float>",
    )
    index = build_proj(df, "emb", out_dim=8, method="pca", seed=3)
    queries = [[float(x) for x in Z[j]] for j in (0, 17, 42)]
    got = projected_knn_batch(index, queries, k=5, oversample=4, id_col="vec_id")
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["q_id"], []).append((r["vec_id"], round(r["dist"], 5)))
    assert set(by_q) == {0, 1, 2}
    for qi, q in enumerate(queries):
        exact = [
            (r["vec_id"], round(r["dist"], 5))
            for r in knn(df, "emb", q, k=5, id_col="vec_id").collect()
        ]
        assert by_q[qi] == exact


def test_validate_ann_covers_proj_backend(spark):
    """The generic recall harness (autotune.validate_ann) accepts the
    projected backend like any other search_fn — ties kind='proj' into
    the same validate_index-analogue story as ivf/srp."""
    from lanterndb_spark.operators.autotune import validate_ann
    from lanterndb_spark.operators.project import build_proj, projected_knn

    rs = np.random.RandomState(31)
    B = rs.standard_normal((6, 32))
    Z = rs.standard_normal((200, 6)) @ B + 0.01 * rs.standard_normal((200, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in Z[i]]) for i in range(200)],
        "vec_id long, emb array<float>",
    )
    index = build_proj(df, "emb", out_dim=8, method="pca", seed=5)

    def search(q, k):
        return projected_knn(
            index.projected, "emb", q, k=k, oversample=4, id_col="vec_id",
            model=index.model, proj_col="__proj",
        )

    recall = validate_ann(df, "emb", "vec_id", search, k=5, n_queries=4, seed=6)
    assert recall == 1.0  # low intrinsic dim: two-stage is exact here
