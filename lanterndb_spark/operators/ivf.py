"""IVF-flat ANN index: k-means centroids + nprobe candidate pruning.

The reference's acceleration structure is an HNSW graph (usearch) built
per-table and stored in index pages. A pointer-chasing graph is the wrong
shape for a shared-nothing engine; the Spark-native equivalent with the
same contract (approximate top-k with a recall/latency knob) is IVF:

- build: one distributed MLlib KMeans over the vector column → ``nlist``
  centroids; every row gets its nearest-centroid ``cluster_id``. Persisted
  with ``partitionBy(cluster_id)`` the layout gives partition pruning —
  the scan for a query only reads ``nprobe``/``nlist`` of the data, the
  IVF analogue of the HNSW index "visiting few nodes"
  (cost model hnsw.c:89-145).
- search: nearest ``nprobe`` centroids to the query (driver-side argmin
  over nlist rows — tiny), then exact knn over only those clusters.
  ``nprobe`` plays the role of the ``ef`` GUC (options.c:337-348):
  recall/latency knob, tuned by operators.autotune.

With nprobe == nlist this degrades gracefully to exact search (recall 1),
mirroring how the reference tests ANN against the exact oracle
(test/sql/hnsw_correct.sql:17-48).
"""

from __future__ import annotations

import numpy as np
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.knn import knn


class IvfIndex:
    """Handle holding the assigned DataFrame + centroid array."""

    def __init__(self, assigned: DataFrame, centroids: np.ndarray, vec_col: str):
        self.assigned = assigned
        self.centroids = centroids
        self.vec_col = vec_col

    @property
    def nlist(self) -> int:
        return len(self.centroids)


def build_ivf(
    df: DataFrame,
    vec_col: str,
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    cluster_col: str = "cluster_id",
) -> IvfIndex:
    """Distributed k-means via MLlib; adds ``cluster_id`` to every row."""
    with_vec = df.withColumn("__mlvec", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter, featuresCol="__mlvec", predictionCol=cluster_col)
    model = km.fit(with_vec)
    assigned = model.transform(with_vec).drop("__mlvec")
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return IvfIndex(assigned, centroids, vec_col)


def save_ivf(index: IvfIndex, path: str, spark=None) -> None:
    """Persist partitioned by cluster_id → partition pruning on search."""
    index.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(f"{path}/data")
    spark = spark or index.assigned.sparkSession
    cent = [(int(i), [float(x) for x in c]) for i, c in enumerate(index.centroids)]
    spark.createDataFrame(cent, "cluster_id int, centroid array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def load_ivf(spark, path: str, vec_col: str) -> IvfIndex:
    assigned = spark.read.parquet(f"{path}/data")
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.array(
        [r["centroid"] for r in sorted(cent_rows, key=lambda r: r["cluster_id"])]
    )
    return IvfIndex(assigned, centroids, vec_col)


def ivf_search(
    index: IvfIndex,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    metric: str = "l2sq",
    id_col: str | None = None,
    pred: Column | None = None,
) -> DataFrame:
    """ANN top-k: prune to the ``nprobe`` nearest clusters, exact re-rank.

    The cluster filter is a plain ``isin`` → Catalyst pushes it to the
    scan (partition pruning when saved partitioned by cluster_id)."""
    q = np.asarray(query, dtype=np.float64)
    d = ((index.centroids - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d)[:nprobe]]
    cand = index.assigned.filter(F.col("cluster_id").isin(probes))
    if pred is not None:
        cand = cand.filter(pred)
    return knn(cand, index.vec_col, query, k=k, metric=metric, id_col=id_col)
