"""Retrieval metrics on a hand-computed example."""

import math

import pytest

from lanterndb_spark.operators.eval import mean_metrics, rank_results, retrieval_metrics
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def case(spark):
    # q1: docs ranked [10, 11, 12]; relevant = {11 (rel 2), 13 (rel 1)}
    # q2: docs ranked [20, 21]; relevant = {20 (rel 1)}
    # q3: no relevant docs retrieved; relevant = {30}
    results = spark.createDataFrame(
        [
            (1, 10, 0.1), (1, 11, 0.2), (1, 12, 0.3),
            (2, 20, 0.1), (2, 21, 0.2),
            (3, 31, 0.1),
        ],
        "q_id int, doc_id int, dist double",
    )
    qrels = spark.createDataFrame(
        [(1, 11, 2), (1, 13, 1), (2, 20, 1), (3, 30, 1)],
        "q_id int, doc_id int, rel int",
    )
    return results, qrels


def test_metrics_hand_computed(case):
    results, qrels = case
    ranked = rank_results(results, "q_id", [F.col("dist").asc(), F.col("doc_id").asc()])
    m = {r["q_id"]: r for r in retrieval_metrics(ranked, qrels, k=3).collect()}

    # q1: hit 11 at rank 2 → recall 1/2, precision 1/3, mrr 1/2
    assert m[1]["recall"] == pytest.approx(0.5)
    assert m[1]["precision"] == pytest.approx(1 / 3)
    assert m[1]["mrr"] == pytest.approx(0.5)
    # dcg = (2^2-1)/log2(3); idcg = 3/log2(2) + 1/log2(3)
    dcg = 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert m[1]["ndcg"] == pytest.approx(dcg / idcg)

    # q2: perfect first hit
    assert m[2]["recall"] == 1.0 and m[2]["mrr"] == 1.0 and m[2]["ndcg"] == 1.0

    # q3: zero scores, not NULL
    assert m[3]["recall"] == 0.0 and m[3]["mrr"] == 0.0 and m[3]["ndcg"] == 0.0

    s = mean_metrics(retrieval_metrics(ranked, qrels, k=3)).first()
    assert s["n_queries"] == 3
    assert s["mean_recall"] == pytest.approx((0.5 + 1.0 + 0.0) / 3)


def test_rank_is_deterministic_under_ties(spark):
    df = spark.createDataFrame(
        [(1, 5, 0.5), (1, 3, 0.5), (1, 4, 0.5)], "q_id int, doc_id int, dist double"
    )
    ranked = rank_results(df, "q_id", [F.col("dist").asc(), F.col("doc_id").asc()])
    got = [r["doc_id"] for r in ranked.orderBy("rank").collect()]
    assert got == [3, 4, 5]


def test_precision_recall_curve_hand_computed(spark):
    from lanterndb_spark.operators.eval import precision_recall_curve

    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.8, 0), (0.4, 0), (0.3, 1), (0.1, 0)],
        "s double, y int",
    )
    rows = precision_recall_curve(df, "s", "y").collect()
    got = [(r["threshold"], r["precision"], r["recall"]) for r in rows]
    assert got == [
        (0.9, 1.0, 0.333333),        # 1 predicted, 1 TP of 3 positives
        (0.8, 0.666667, 0.666667),   # tie group enters together
        (0.4, 0.5, 0.666667),
        (0.3, 0.6, 1.0),
        (0.1, 0.5, 1.0),
    ]
    # recall is monotone non-decreasing as the threshold drops
    rc = [r["recall"] for r in rows]
    assert rc == sorted(rc)
    f1 = {r["threshold"]: r["f1"] for r in rows}
    assert f1[0.3] == 0.75
