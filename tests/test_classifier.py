"""Quality classifier: features, IRLS fit, literal-expression scoring, AUC."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.classifier import (
    FEATURE_COLS,
    LogRegModel,
    binary_auc,
    logreg_fit,
    logreg_score,
    quality_classifier,
    text_quality_features,
)


def test_features_values(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "zzz zzz zzz"),
            (3, ""),
        ],
        "id long, text string",
    )
    got = {r["id"]: r for r in text_quality_features(df, "text").collect()}
    assert got[1]["f_tokens"] == 6.0
    assert got[1]["f_mean_len"] == pytest.approx((3 + 3 + 3 + 2 + 3 + 3) / 6)
    assert got[1]["f_stop"] > 0.3  # 'the' twice + 'on'
    assert got[1]["f_alnum"] == 1.0
    assert got[1]["f_dup1"] == pytest.approx(1 / 6)  # 'the' repeats once
    assert got[2]["f_dup1"] == pytest.approx(2 / 3)
    assert got[3]["f_tokens"] == 0.0 and got[3]["f_mean_len"] == 0.0


def test_fit_learns_separable_rule_and_is_deterministic(spark):
    rs = np.random.RandomState(0)
    rows = []
    for i in range(400):
        x = rs.uniform(-2, 2)
        noise = rs.uniform(-2, 2)
        rows.append((i, float(x), float(noise), int(x > 0)))
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double, y int")
    m1 = logreg_fit(df, ["f1", "f2"], "y", seed=1)
    m2 = logreg_fit(df, ["f1", "f2"], "y", seed=1)
    assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias
    assert m1.weights[0] > 3 * abs(m1.weights[1])  # signal dominates noise
    scored = logreg_score(df, m1, feature_cols=["f1", "f2"])
    acc = (
        scored.select(
            ((F.col("quality_prob") > 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc > 0.97
    assert binary_auc(scored, "quality_prob", "y") > 0.99


def test_score_expr_matches_numpy(spark):
    model = LogRegModel(
        ("f1", "f2"),
        np.array([1.0, -2.0]),
        np.array([0.5, 4.0]),
        np.array([1.5, -0.75]),
        0.25,
    )
    rows = [(i, float(i) / 3.0, float(-i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double")
    got = {r["id"]: r["p"] for r in
           logreg_score(df, model, out_col="p").collect()}
    for i, f1, f2 in rows:
        z = 0.25 + 1.5 * ((f1 - 1.0) / 0.5) - 0.75 * ((f2 + 2.0) / 4.0)
        assert got[i] == pytest.approx(1 / (1 + np.exp(-z)), abs=1e-12)


def test_quality_classifier_end_to_end(tables):
    docs = tables["documents"]
    med = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
    lab = docs.withColumn("y", (F.col("n_chars") > F.lit(med)).cast("int"))
    scored, model = quality_classifier(lab, "text", "y")
    assert model.feature_cols == FEATURE_COLS
    acc = (
        scored.select(
            ((F.col("quality_prob") > 0.5).cast("int") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc > 0.9
    assert binary_auc(scored, "quality_prob", "y") > 0.95


def test_auc_edge_cases(spark):
    # perfect separation -> 1.0; anti-separation -> 0.0; one class -> nan
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    assert binary_auc(df, "s", "y") == 1.0
    flipped = df.withColumn("y", 1 - F.col("y"))
    assert binary_auc(flipped, "s", "y") == 0.0
    ones = df.withColumn("y", F.lit(1))
    assert np.isnan(binary_auc(ones, "s", "y"))
    # ties across classes get average rank: all-equal scores -> 0.5
    tied = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "s double, y int"
    )
    assert binary_auc(tied, "s", "y") == 0.5


def test_fit_rejects_nonbinary(spark):
    df = spark.createDataFrame([(1.0, 2), (2.0, 0)] * 3, "f double, y int")
    with pytest.raises(ValueError):
        logreg_fit(df, ["f"], "y")
