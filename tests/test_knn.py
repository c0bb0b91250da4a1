import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.knn import knn


def test_top1_small_world(small_world):
    # hnsw_select.sql-style: nearest neighbor of a corner is itself
    r = knn(small_world, "v", [1.0, 0.0, 0.0], k=1, id_col="id").first()
    assert r["id"] == "100"
    assert r["dist"] == pytest.approx(0.0)


def test_topk_order_and_tiebreak(small_world):
    rows = knn(small_world, "v", [0.0, 0.0, 0.0], k=4, id_col="id").collect()
    # dist 0 then three dist-1 corners in id order (deterministic tie-break)
    assert [r["id"] for r in rows] == ["000", "001", "010", "100"]
    assert [r["dist"] for r in rows] == pytest.approx([0.0, 1.0, 1.0, 1.0])


def test_filtered_knn(small_world):
    rows = knn(
        small_world, "v", [0.0, 0.0, 0.0], k=8, id_col="id", pred=F.col("b")
    ).collect()
    assert all(int(r["id"], 2) % 2 == 0 for r in rows)
    assert len(rows) == 4


def test_knn_plan_is_take_ordered(small_world):
    plan = knn(small_world, "v", [0.0, 0.0, 0.0], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_knn_cosine_on_embeddings(tables):
    emb = tables["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    rows = knn(emb, "embedding", [float(x) for x in q], k=3, metric="cos", id_col="vec_id").collect()
    assert rows[0]["vec_id"] == 0
    assert rows[0]["dist"] == pytest.approx(0.0, abs=1e-6)
    assert rows[0]["dist"] <= rows[1]["dist"] <= rows[2]["dist"]


def test_knn_join_matches_per_query_knn(tables, spark):
    from lanterndb_spark.operators.knn import knn_join

    emb = tables["embeddings"]
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    res = knn_join(emb, "embedding", qdf, "qv", k=5, id_col="vec_id").collect()
    by_q = {}
    for r in sorted(res, key=lambda r: (r["q_id"], r["dist"], r["vec_id"])):
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    assert set(by_q) == {0, 1, 2}
    for qid, ids in by_q.items():
        q = [float(x) for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]]
        exact = [r["vec_id"] for r in knn(emb, "embedding", q, k=5, id_col="vec_id").collect()]
        assert ids == exact


def test_knn_join_plan_has_window_group_limit(tables):
    from lanterndb_spark.operators.knn import knn_join

    emb = tables["embeddings"]
    qdf = emb.limit(2).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    plan = (
        knn_join(emb, "embedding", qdf, "qv", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # map-side top-k prune before shuffle


def test_knn_join_arrow_matches_expr(tables, spark):
    from lanterndb_spark.operators.knn import knn_join

    emb = tables["embeddings"]
    qdf = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    for metric in ("l2sq", "cos"):
        a = knn_join(emb, "embedding", qdf, "qv", k=5, metric=metric,
                     id_col="vec_id", impl="arrow").collect()
        b = knn_join(emb, "embedding", qdf, "qv", k=5, metric=metric,
                     id_col="vec_id", impl="expr").collect()
        ka = sorted((r["q_id"], r["vec_id"]) for r in a)
        kb = sorted((r["q_id"], r["vec_id"]) for r in b)
        assert ka == kb


def test_knn_stream_doubles_and_exhausts(small_world):
    from lanterndb_spark.operators.knn import knn_stream

    got = [r["id"] for r in knn_stream(small_world, "v", [0.0, 0.0, 0.0],
                                       init_k=2, id_col="id")]
    want = [r["id"] for r in knn(small_world, "v", [0.0, 0.0, 0.0], k=8,
                                 id_col="id").collect()]
    assert got == want  # all 8 corners, in distance order, no dups


def test_knn_stream_partial_consumption(small_world):
    from lanterndb_spark.operators.knn import knn_stream

    gen = knn_stream(small_world, "v", [0.0, 0.0, 0.0], init_k=2, id_col="id")
    first_three = [next(gen)["id"] for _ in range(3)]
    assert first_three == ["000", "001", "010"]


def test_knn_join_arrow_rejects_oversized_query_table(spark, tables):
    """The arrow path broadcasts the query table; exceeding the documented
    100k bound must raise instead of silently collecting it."""
    import pytest

    from lanterndb_spark.operators.knn import knn_join

    emb = tables["embeddings"]
    big_q = spark.range(100_001).select(
        F.col("id").alias("q_id"),
        F.array(F.lit(0.1), F.lit(0.2)).alias("qv"),
    )
    with pytest.raises(ValueError, match="100000"):
        knn_join(emb, "embedding", big_q, "qv", k=3, impl="arrow")


def test_hard_negatives_excludes_positives(spark, tables):
    from lanterndb_spark.operators.knn import hard_negatives, knn_join

    emb = tables["embeddings"]
    anchors = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    out = hard_negatives(
        emb, "embedding", anchors,
        "qv", exclude=F.col("label") == F.col("q_label"),
        k=5, id_col="vec_id",
    ).collect()
    # exactly k negatives per anchor, none sharing the anchor's label
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert all(r["label"] != r["q_label"] for r in rows)

    # brute-force agreement: full knn_join with big k, filter, take 5
    full = knn_join(
        emb, "embedding",
        anchors.select("q_id", "qv"), "qv",
        k=emb.count(), id_col="vec_id",
    )
    lab = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    alab = {r["q_id"]: r["q_label"] for r in anchors.collect()}
    want = {}
    for r in sorted(full.collect(), key=lambda r: (r["q_id"], r["dist"], r["vec_id"])):
        if lab[r["vec_id"]] != alab[r["q_id"]]:
            want.setdefault(r["q_id"], [])
            if len(want[r["q_id"]]) < 5:
                want[r["q_id"]].append(r["vec_id"])
    got = {q: [r["vec_id"] for r in sorted(rows, key=lambda r: (r["dist"], r["vec_id"]))]
           for q, rows in by_q.items()}
    assert got == want
