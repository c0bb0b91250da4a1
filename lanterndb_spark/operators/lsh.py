"""Signed-random-projection (SRP) LSH — the second ANN backend beside IVF.

The reference exposes exactly one ANN structure (HNSW) with a
recall/latency knob (``ef``). Our engine exposes two Spark-native
backends with the same contract: IVF (operators/ivf.py — centroid
pruning, best for L2) and this module (hyperplane sketches, natural for
cosine). Both are tuned/validated by operators/autotune.py, mirroring
index_autotune/mod.rs.

Design (all JVM-side after a one-time vectorized sketch):
- build: ``nbits`` seeded random hyperplanes; sig = sign bits of
  ``V @ H^T`` packed into ``nbits/64`` bigints. One Arrow-batched matmul
  per partition — no shuffle, no training pass (hyperplanes are
  data-independent, unlike IVF centroids).
- search: hamming(sig(q), sig(v)) approximates angle — rank by popcount
  of xor (``bit_count`` is codegen'd), take ``k·oversample`` candidates,
  exact re-rank. The scan reads only the (id, sig) sketch — at 100 TB
  that is nbits/8 bytes per row instead of 4·dim, and the re-rank
  fetches full vectors for candidates only (semi-join on id).
- ``oversample`` plays the role of ``ef`` (options.c:337-348).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.knn import knn


class SrpIndex:
    def __init__(self, sketched: DataFrame, planes: np.ndarray, vec_col: str, sig_cols: list[str]):
        self.sketched = sketched
        self.planes = planes  # (nbits, dim)
        self.vec_col = vec_col
        self.sig_cols = sig_cols

    @property
    def nbits(self) -> int:
        return self.planes.shape[0]


def _pack_signs(signs: np.ndarray) -> np.ndarray:
    """(n, nbits) bool → (n, nbits//64) int64 with bit i of word w =
    sign[w*64+i]."""
    n, nbits = signs.shape
    words = nbits // 64
    out = np.zeros((n, words), dtype=np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for w in range(words):
        out[:, w] = (signs[:, w * 64 : (w + 1) * 64].astype(np.uint64) * weights).sum(axis=1)
    return out.view(np.int64)


def _sig_of(planes: np.ndarray, x: np.ndarray) -> np.ndarray:
    return _pack_signs(x @ planes.T >= 0)


def _with_sketch(df: DataFrame, planes: np.ndarray, vec_col: str, sig_cols: list[str]) -> DataFrame:
    bc = df.sparkSession.sparkContext.broadcast(planes)

    @F.pandas_udf("array<bigint>")
    def sketch(s: pd.Series) -> pd.Series:
        x = np.asarray(s.tolist(), dtype=np.float64)
        return pd.Series(list(_sig_of(bc.value, x)))

    out = df.withColumn("__sig", sketch(F.col(vec_col)))
    for w, c in enumerate(sig_cols):
        out = out.withColumn(c, F.col("__sig")[w])
    return out.drop("__sig")


def build_srp(
    df: DataFrame, vec_col: str, nbits: int = 128, dim: int | None = None, seed: int = 42
) -> SrpIndex:
    """Attach ``sig_0..sig_{nbits/64-1}`` bigint sketch columns."""
    if nbits % 64:
        raise ValueError("nbits must be a multiple of 64")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    sig_cols = [f"sig_{w}" for w in range(nbits // 64)]
    return SrpIndex(_with_sketch(df, planes, vec_col, sig_cols), planes, vec_col, sig_cols)


def srp_sketch(index: SrpIndex, delta: DataFrame) -> DataFrame:
    """Sketch NEW rows with the index's existing hyperplanes — the
    insert-without-rebuild path (hyperplanes are data-independent, so
    delta sketches are exactly what a full rebuild would produce)."""
    return _with_sketch(delta, index.planes, index.vec_col, index.sig_cols)


def save_srp(index: SrpIndex, path: str) -> None:
    """Persist sketch table + hyperplanes (both plain parquet — engine
    state is data, like the IVF layout)."""
    index.sketched.write.mode("overwrite").parquet(f"{path}/data")
    spark = index.sketched.sparkSession
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(index.planes)]
    spark.createDataFrame(rows, "plane_id int, coef array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/planes")


def load_srp(spark, path: str, vec_col: str) -> SrpIndex:
    sketched = spark.read.parquet(f"{path}/data")
    rows = spark.read.parquet(f"{path}/planes").collect()
    planes = np.array([r["coef"] for r in sorted(rows, key=lambda r: r["plane_id"])])
    words = planes.shape[0] // 64
    return SrpIndex(sketched, planes, vec_col, [f"sig_{w}" for w in range(words)])


def _hamming_to_query(index: SrpIndex, qsig: np.ndarray) -> Column:
    expr = F.lit(0).cast("bigint")
    for w, c in enumerate(index.sig_cols):
        expr = expr + F.bit_count(F.col(c).bitwiseXOR(F.lit(int(qsig[w]))))
    return expr


def srp_search(
    index: SrpIndex,
    query: list[float],
    k: int = 10,
    oversample: int = 10,
    metric: str = "cos",
    id_col: str | None = None,
    pred: Column | None = None,
) -> DataFrame:
    """ANN top-k: rank by sketch hamming distance (pure codegen popcount),
    keep k·oversample candidates, exact re-rank under ``metric``.

    ``pred`` composes a row filter with the index scan (the reference's
    filtered ANN query, hnsw_select.sql:50-51): applied BEFORE the sketch
    ranking so the candidate budget is spent on qualifying rows only —
    a post-filter would silently return < k rows on selective predicates.
    """
    q = np.asarray(query, dtype=np.float64)
    qsig = _sig_of(index.planes, q[None, :])[0]
    ham = _hamming_to_query(index, qsig)
    order = [ham.asc()] + ([F.col(id_col).asc()] if id_col else [])
    base = index.sketched.filter(pred) if pred is not None else index.sketched
    cand = base.orderBy(*order).limit(k * oversample)
    return knn(cand, index.vec_col, query, k=k, metric=metric, id_col=id_col)


def srp_search_batch(
    index: SrpIndex,
    queries: list[list[float]],
    k: int = 10,
    oversample: int = 10,
    metric: str = "cos",
    id_col: str | None = None,
    pred: Column | None = None,
) -> DataFrame:
    """Batch variant: one job for all queries (see knn.knn_join for the
    WindowGroupLimit shape). Candidate stage and re-rank stage are both
    per-query windows. ``pred`` filters rows BEFORE the sketch ranking
    (filtered ANN, hnsw_select.sql:50-51)."""
    from pyspark.sql import Window

    from lanterndb_spark.functions.distance import distance

    spark = index.sketched.sparkSession
    qarr = np.asarray(queries, dtype=np.float64)
    sigs = _sig_of(index.planes, qarr)
    rows = [
        (int(i), [float(x) for x in qarr[i]], [int(w) for w in sigs[i]])
        for i in range(len(queries))
    ]
    qdf = spark.createDataFrame(rows, "q_id int, __qv array<double>, __qsig array<bigint>")
    from lanterndb_spark.plans.shape import widen_partitions

    base = index.sketched.filter(pred) if pred is not None else index.sketched
    pairs = widen_partitions(base).join(F.broadcast(qdf))
    ham = F.lit(0).cast("bigint")
    for w, c in enumerate(index.sig_cols):
        ham = ham + F.bit_count(F.col(c).bitwiseXOR(F.col("__qsig")[w]))
    order1 = [F.col("__ham").asc()] + ([F.col(id_col).asc()] if id_col else [])
    w1 = Window.partitionBy("q_id").orderBy(*order1)
    cand = (
        pairs.withColumn("__ham", ham)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k * oversample)
        .drop("__rn", "__ham")
    )
    cand = cand.withColumn("dist", distance(metric, index.vec_col, F.col("__qv")))
    order2 = [F.col("dist").asc()] + ([F.col(id_col).asc()] if id_col else [])
    w2 = Window.partitionBy("q_id").orderBy(*order2)
    return (
        cand.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__qv", "__qsig", "__rn")
    )
