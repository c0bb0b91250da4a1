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
