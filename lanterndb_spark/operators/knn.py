"""Exact top-k nearest-neighbor retrieval — the core query operator.

Reference: the ONLY way lantern's HNSW index is used is
``SELECT … ORDER BY v <-> q LIMIT k`` (order-by-operator scan,
lantern_hnsw/src/hnsw.c:230-236, scan.c:167-238). Filtered ANN composes a
WHERE clause with the ordered scan (test/sql/hnsw_select.sql:50-51).

Spark recast: ``df.filter(pred).withColumn(dist).orderBy(dist).limit(k)``.
Catalyst turns sort+limit into ``TakeOrderedAndProject`` — each partition
computes its local top-k with a bounded heap and the driver merges k-sized
lists, so the plan does no global shuffle and scales linearly with
partition count. That IS the distributed exact-knn algorithm; no custom
code needed. ANN acceleration (IVF / PQ) lives in ``operators.ivf`` and
``operators.pq`` and reuses this operator for the final re-rank.

Determinism: ties at the k boundary are broken on ``id_col`` so results
are stable across partitionings and comparable to a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.distance import distance, query_vec


def knn(
    df: DataFrame,
    vec_col: str,
    query,
    k: int = 10,
    metric: str = "l2sq",
    pred: Column | None = None,
    id_col: str | None = None,
    dist_col: str = "dist",
) -> DataFrame:
    """Exact k-nearest-neighbors of ``query`` under ``metric``.

    ``query`` may be a python list (literal vector) or a Column.
    ``pred`` is an optional pre-filter (applied before the ordered scan,
    like Postgres applies WHERE before LIMIT). ``id_col`` adds a
    deterministic tie-break.
    """
    q = query if isinstance(query, Column) else query_vec(query)
    if pred is not None:
        df = df.filter(pred)
    out = df.withColumn(dist_col, distance(metric, vec_col, q))
    order = [F.col(dist_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())
    return out.orderBy(*order).limit(k)


def knn_join(
    data: DataFrame,
    vec_col: str,
    queries: DataFrame,
    q_vec_col: str,
    k: int = 10,
    metric: str = "l2sq",
    id_col: str | None = None,
    q_id_col: str = "q_id",
    dist_col: str = "dist",
) -> DataFrame:
    """Top-k neighbors in ``data`` for EVERY row of ``queries`` — the
    reference's lateral-join query shape (test/sql/hnsw_select.sql:66-67:
    ``FROM queries, LATERAL (SELECT … ORDER BY v <-> q.v LIMIT k)``) as one
    distributed job instead of a per-query driver loop.

    Plan: broadcast the (small) query set → each data partition scores all
    queries map-side → ``row_number() OVER (PARTITION BY q_id ORDER BY
    dist)`` ≤ k. Spark ≥3.5 rewrites the rank filter into a
    WindowGroupLimit that prunes to a per-partition top-k heap BEFORE the
    shuffle, so the exchange carries ≤ k·partitions rows per query — the
    same partial-top-k + merge shape as single-query knn. Scales to any
    data size; query side should stay broadcast-small (≤ ~100k rows).
    """
    from pyspark.sql import Window

    from lanterndb_spark.plans.shape import widen_partitions

    pairs = widen_partitions(data).join(
        F.broadcast(queries.select(F.col(q_id_col), F.col(q_vec_col).alias("__qv")))
    )
    pairs = pairs.withColumn(dist_col, distance(metric, vec_col, F.col("__qv")))
    order = [F.col(dist_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(q_id_col).orderBy(*order)
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__qv", "__rn")
    )
