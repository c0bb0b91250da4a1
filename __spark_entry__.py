"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` pairs are compared by the driver against DuckDB at
sf=0.01 (row-count + schema + order-insensitive value-hash).

Implementation lives in ``lanterndb_spark/``; this module only wires
operators to the driver harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lanterndb_spark.functions.distance import distance
from lanterndb_spark.operators.hybrid import weighted_vector_search
from lanterndb_spark.operators.knn import knn
from lanterndb_spark.oracle import ROUND, duck_cos, duck_l2sq
from lanterndb_spark.session import load_tables


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ["embeddings"])["embeddings"]


def _with_query_vec(df: DataFrame, qid: int, src: str = "embedding", out: str = "qv") -> DataFrame:
    """Attach the vector of row ``vec_id == qid`` as a broadcast query column.

    Keeps the query vector out of literals so the DuckDB oracle can derive
    the exact same value from the same parquet bytes.
    """
    q = F.broadcast(df.filter(F.col("vec_id") == qid).select(F.col(src).alias(out)))
    return df.crossJoin(q)


def _round_out(df: DataFrame, cols: list[str], score: str) -> DataFrame:
    return df.select(*cols, F.round(F.col(score), ROUND).alias(score))


# ---------------------------------------------------------------- queries

def q_knn_l2sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_query_vec(_emb(spark, sf_dir), 0)
    out = knn(emb, "embedding", F.col("qv"), k=10, metric="l2sq", id_col="vec_id")
    return _round_out(out, ["vec_id", "label"], "dist")


def q_knn_cos(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_query_vec(_emb(spark, sf_dir), 7)
    out = knn(emb, "embedding", F.col("qv"), k=10, metric="cos", id_col="vec_id")
    return _round_out(out, ["vec_id", "label"], "dist")


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # WHERE + ORDER BY compose (reference: test/sql/hnsw_select.sql:50-51)
    emb = _with_query_vec(_emb(spark, sf_dir), 0)
    out = knn(
        emb, "embedding", F.col("qv"), k=10, metric="l2sq",
        id_col="vec_id", pred=F.col("label") == 3,
    )
    return _round_out(out, ["vec_id", "label"], "dist")


def q_knn_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer[] vectors derived deterministically from the float embeddings
    emb = _emb(spark, sf_dir).withColumn(
        "iv", F.transform("embedding", lambda x: F.floor(x.cast("double") * 10).cast("int"))
    )
    q = F.broadcast(emb.filter(F.col("vec_id") == 3).select(F.col("iv").alias("qv")))
    out = knn(emb.crossJoin(q), "iv", F.col("qv"), k=10, metric="hamming", id_col="vec_id")
    return out.select("vec_id", "label", F.col("dist").cast("int").alias("dist"))


def _hybrid_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
        "label",
    )
    q1 = F.broadcast(df.filter(F.col("id") == 0).select(F.col("v1").alias("qv1")))
    q2 = F.broadcast(df.filter(F.col("id") == 7).select(F.col("v2").alias("qv2")))
    return df.crossJoin(q1).crossJoin(q2)


def q_hybrid_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _hybrid_df(spark, sf_dir)
    out = weighted_vector_search(
        df,
        [(1.0, "v1", F.col("qv1")), (0.5, "v2", F.col("qv2"))],
        id_col="id", metric="l2sq", exact=True, limit=20,
    )
    return _round_out(out, ["id", "label"], "joint_dist")


def q_hybrid_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _hybrid_df(spark, sf_dir)
    out = weighted_vector_search(
        df,
        [(1.0, "v1", F.col("qv1")), (0.5, "v2", F.col("qv2"))],
        id_col="id", metric="l2sq", ef=50, limit=20,
    )
    return _round_out(out, ["id", "label"], "joint_dist")


# ------------------------------------------------------------- oracle SQL

_Q0 = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"


def _knn_oracle(qid: int, dist_expr_fn, where: str = "") -> str:
    q = f"(SELECT embedding FROM embeddings WHERE vec_id = {qid})"
    d = dist_expr_fn("embedding", q)
    return f"""
    SELECT vec_id, label, round(dist, {ROUND}) AS dist FROM (
      SELECT vec_id, label, {d} AS dist
      FROM embeddings {where}
      ORDER BY dist, vec_id LIMIT 10
    ) t
    """


_HYBRID_BASE = f"""
    SELECT vec_id AS id, label,
           embedding AS v1, list_reverse(embedding) AS v2,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) AS qv1,
           (SELECT list_reverse(embedding) FROM embeddings WHERE vec_id = 7) AS qv2
    FROM embeddings
"""


def _hybrid_joint() -> str:
    return f"(1.0 * {duck_l2sq('v1', 'qv1')} + 0.5 * {duck_l2sq('v2', 'qv2')})"


def oracle_sql() -> dict[str, str]:
    hybrid_exact = f"""
    WITH base AS ({_HYBRID_BASE})
    SELECT id, label, round(jd, {ROUND}) AS joint_dist FROM (
      SELECT id, label, {_hybrid_joint()} AS jd FROM base
      ORDER BY jd, id LIMIT 20
    ) t
    """
    # candidate mode: per-column top-ef, UNION ALL, dedup, re-rank by joint
    # (mirrors lantern.sql:769-806)
    hybrid_candidate = f"""
    WITH base AS ({_HYBRID_BASE}),
    q1 AS (SELECT * FROM base ORDER BY {duck_l2sq('v1', 'qv1')}, id LIMIT 50),
    q2 AS (SELECT * FROM base ORDER BY {duck_l2sq('v2', 'qv2')}, id LIMIT 50),
    unioned AS (SELECT * FROM q1 UNION ALL SELECT * FROM q2),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY id ORDER BY id) AS rn FROM unioned
      ) WHERE rn = 1
    )
    SELECT id, label, round(jd, {ROUND}) AS joint_dist FROM (
      SELECT id, label, {_hybrid_joint()} AS jd FROM dedup
      ORDER BY jd, id LIMIT 20
    ) t
    """
    hamming = f"""
    WITH iv_t AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS INT)) AS iv
      FROM embeddings
    )
    SELECT vec_id, label, CAST(dist AS INT) AS dist FROM (
      SELECT vec_id, label,
             list_sum(list_transform(list_zip(iv, (SELECT iv FROM iv_t WHERE vec_id = 3)),
               x -> bit_count(CAST(xor(CAST(x[1] AS BIGINT), CAST(x[2] AS BIGINT)) & 4294967295 AS BIGINT)))) AS dist
      FROM iv_t
      ORDER BY dist, vec_id LIMIT 10
    ) t
    """
    return {
        "knn_l2sq": _knn_oracle(0, duck_l2sq),
        "knn_cos": _knn_oracle(7, duck_cos),
        "knn_filtered": _knn_oracle(0, duck_l2sq, where="WHERE label = 3"),
        "knn_hamming": hamming,
        "hybrid_exact": hybrid_exact,
        "hybrid_candidate": hybrid_candidate,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_l2sq": q_knn_l2sq,
        "knn_cos": q_knn_cos,
        "knn_filtered": q_knn_filtered,
        "knn_hamming": q_knn_hamming,
        "hybrid_exact": q_hybrid_exact,
        "hybrid_candidate": q_hybrid_candidate,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: weighted 2-vector hybrid search on sf0.001."""
    return q_hybrid_exact(spark, "/root/testdata/sf0.001")
