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
