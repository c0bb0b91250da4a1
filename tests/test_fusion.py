"""RRF fusion: rank math, missing-list convention, wrapper composition."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.fusion import hybrid_lexical_semantic, rrf_fuse, with_rank


def test_rrf_hand_computed(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id int, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], "id int, rank int")
    got = {r["id"]: r["rrf_score"] for r in rrf_fuse([a, b], "id", k=60).collect()}
    assert got[1] == pytest.approx(1 / 61 + 1 / 62)
    assert got[2] == pytest.approx(1 / 62)      # only in list a
    assert got[3] == pytest.approx(1 / 63 + 1 / 61)
    assert got[4] == pytest.approx(1 / 63)      # only in list b
    order = [r["id"] for r in rrf_fuse([a, b], "id", k=60).collect()]
    assert order[0] in (1, 3)  # the two double-listed docs lead


def test_with_rank_directions(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 0.1), (3, 0.9)], "id int, s double")
    asc = {r["id"]: r["rank"] for r in with_rank(df, "s", "id", ascending=True).collect()}
    desc = {r["id"]: r["rank"] for r in with_rank(df, "s", "id", ascending=False).collect()}
    assert asc == {2: 1, 1: 2, 3: 3}
    assert desc == {3: 1, 1: 2, 2: 3}


def test_hybrid_wrapper_matches_manual(tables):
    from lanterndb_spark.operators.bm25 import search_bm25
    from lanterndb_spark.operators.knn import knn

    docs = tables["documents"]
    emb = tables["embeddings"]
    bm = search_bm25(docs, "spark window merge", limit=10, round_scores=6)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    kn = knn(emb, "embedding", q, k=10, id_col="vec_id").withColumnRenamed(
        "vec_id", "doc_id"
    )
    fused = hybrid_lexical_semantic(bm, kn, "doc_id", limit=15).collect()
    assert 1 <= len(fused) <= 15
    manual = rrf_fuse(
        [with_rank(bm, "bm25", "doc_id", False), with_rank(kn, "dist", "doc_id", True)],
        "doc_id", limit=15,
    ).collect()
    assert [(r["doc_id"], round(r["rrf_score"], 9)) for r in fused] == [
        (r["doc_id"], round(r["rrf_score"], 9)) for r in manual
    ]
