import math

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.functions.distance import (
    cos_dist,
    distance,
    hamming_dist,
    inner_dist,
    l2_dist,
    l2sq_dist,
    query_vec,
    check_dims,
)


def one(spark, expr_col, a, b, typ="array<double>"):
    df = spark.createDataFrame([(a, b)], f"a {typ}, b {typ}")
    return df.select(expr_col.alias("d")).first()["d"]


def test_l2sq_is_squared(spark):
    # reference: l2sq has NO sqrt (lantern_hnsw/src/hnsw.c:354-360)
    assert one(spark, l2sq_dist("a", "b"), [0.0, 0.0], [3.0, 4.0]) == pytest.approx(25.0)
    assert one(spark, l2_dist("a", "b"), [0.0, 0.0], [3.0, 4.0]) == pytest.approx(5.0)


def test_cos_dist_is_distance_not_similarity(spark):
    assert one(spark, cos_dist("a", "b"), [1.0, 0.0], [1.0, 0.0]) == pytest.approx(0.0)
    assert one(spark, cos_dist("a", "b"), [1.0, 0.0], [0.0, 1.0]) == pytest.approx(1.0)
    assert one(spark, cos_dist("a", "b"), [1.0, 0.0], [-1.0, 0.0]) == pytest.approx(2.0)


def test_hamming_32bits_per_element(spark):
    # each int32 element contributes 32 bits (hnsw.c:308-319)
    assert one(spark, hamming_dist("a", "b"), [0, 0], [1, 3], "array<int>") == 3
    assert one(spark, hamming_dist("a", "b"), [0], [-1], "array<int>") == 32
    assert one(spark, hamming_dist("a", "b"), [5, 7], [5, 7], "array<int>") == 0


def test_inner_dist_negative_dot(spark):
    assert one(spark, inner_dist("a", "b"), [1.0, 2.0], [3.0, 4.0]) == pytest.approx(-11.0)


def test_operator_sugar_dispatch(spark):
    assert one(spark, distance("<->", "a", "b"), [0.0], [2.0]) == pytest.approx(4.0)
    assert one(spark, distance("<=>", "a", "b"), [1.0, 0.0], [0.0, 1.0]) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        distance("abracadabra", "a", "b")


def test_dim_mismatch_yields_null(spark):
    # zip_with pads with null -> null distance; check_dims gives hard error
    df = spark.createDataFrame([([1.0, 2.0],)], "v array<double>")
    r = df.select(l2sq_dist("v", query_vec([1.0])).alias("d")).first()["d"]
    assert r is None
    with pytest.raises(ValueError):
        check_dims(df, "v", 3)


def test_small_world_distances(small_world):
    # from corner [0,0,0]: distance == number of 1-bits of the corner id
    got = {
        r["id"]: r["d"]
        for r in small_world.select(
            "id", l2sq_dist("v", query_vec([0.0, 0.0, 0.0])).alias("d")
        ).collect()
    }
    for key, d in got.items():
        assert d == pytest.approx(key.count("1"))


def test_sql_registered_functions_match_expressions(spark, tables):
    """SQL-callable names (sqlreg) must agree with the Catalyst
    expressions (functions.distance) on real vectors."""
    from pyspark.sql import functions as F

    from lanterndb_spark.functions.distance import distance
    from lanterndb_spark.functions.sqlreg import register_sql_functions

    register_sql_functions(spark)
    emb = tables["embeddings"].limit(50)
    emb.createOrReplaceTempView("sqlreg_t")
    q = emb.select(F.col("embedding").alias("qv")).limit(1)
    df = emb.crossJoin(F.broadcast(q))
    for sql_name, metric in [("l2sq_dist", "l2sq"), ("cos_dist", "cos"), ("inner_product", "inner")]:
        got = spark.sql(
            f"SELECT vec_id, {sql_name}(embedding, (SELECT first(embedding) FROM sqlreg_t)) AS d "
            "FROM sqlreg_t"
        ).collect()
        want = {
            r["vec_id"]: r["d"]
            for r in df.select("vec_id", distance(metric, "embedding", F.col("qv")).alias("d")).collect()
        }
        for r in got:
            assert abs(r["d"] - want[r["vec_id"]]) < 1e-9, (sql_name, r["vec_id"])


def test_sql_hamming_and_stem(spark):
    from lanterndb_spark.functions.sqlreg import register_sql_functions
    from lanterndb_spark.functions.text import tokenize_py

    register_sql_functions(spark)
    df = spark.createDataFrame(
        [([0b1010, 3], [0b0110, 1], "The quick brown fox jumps over the lazy dog")],
        "a array<int>, b array<int>, t string",
    )
    df.createOrReplaceTempView("sqlreg_h")
    row = spark.sql(
        "SELECT hamming_dist(a, b) AS h, text_to_stem_array(t) AS st FROM sqlreg_h"
    ).first()
    assert row["h"] == 3  # 1010^0110=1100 (2 bits) + 3^1=10 (1 bit)
    assert row["st"] == tokenize_py("The quick brown fox jumps over the lazy dog", stem=True)
