#!/usr/bin/env python
"""Phase decomposition of one steady-state streaming-semdedup
micro-batch (r15 'not yet optimized' item 1): mirrors
SemanticDedupIngest.writer() step by step with wall clocks around each
phase — (a) within-batch self-join checkpoint, (b) cross search against
the accumulated graph + union + localCheckpoint, (c) hnsw_insert
broadcast shape (key collect / merge materialize split) — over several
steady batches, so the ~4 s/batch floor is attributed to a phase
instead of guessed. Writes spark-warehouse/semdedup_decomp_r15.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables

OUT = os.path.join(ROOT, "spark-warehouse", "semdedup_decomp_r15.json")
N_STEADY = int(os.environ.get("SEMDEDUP_BATCHES", "6"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="semdedup-decomp-r15")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    emb.cache().count()

    from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_insert, hnsw_search_df
    from lanterndb_spark.streaming.semdedup import SemanticDedupIngest

    schema = emb.select("vec_id", "embedding").schema
    rows = emb.select("vec_id", "embedding").limit(64 * (N_STEADY + 2)).collect()
    batches = [
        spark.createDataFrame(rows[i * 64:(i + 1) * 64], schema)
        for i in range(N_STEADY + 2)
    ]

    handle = SemanticDedupIngest("vec_id", "embedding", max_cos_dist=0.2)
    handle.writer()(batches[0], 0)  # graph build batch
    handle.writer()(batches[1], 1)  # first steady batch (warm)

    phases: dict[str, list] = {
        "within_checkpoint": [], "cross_checkpoint": [],
        "insert_total": [], "insert_keys_collect": [],
        "insert_materialize": [], "batch_total": [],
    }
    for bi in range(2, 2 + N_STEADY):
        batch = batches[bi].select("vec_id", "embedding")
        t_b0 = time.monotonic()

        t0 = time.monotonic()
        within = handle._within_batch_pairs(batch).localCheckpoint(eager=True)
        phases["within_checkpoint"].append(round(time.monotonic() - t0, 3))

        t0 = time.monotonic()
        qdf = batch.select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("query"))
        cross = (
            hnsw_search_df(handle.index, qdf, k=handle.k_neighbors,
                           ef=handle.ef, nprobe=handle.nprobe,
                           unique_q_ids=True, broadcast_queries=True)
            .filter(F.col("dist") <= handle.max_cos_dist)
            .select(F.least("q_id", "vec_id").alias("id_a"),
                    F.greatest("q_id", "vec_id").alias("id_b"),
                    F.col("dist").alias("cos_dist"))
        )
        found = within.unionByName(cross).localCheckpoint(eager=True)
        phases["cross_checkpoint"].append(round(time.monotonic() - t0, 3))

        t0 = time.monotonic()
        old = handle.index
        handle.index = hnsw_insert(old, batch, broadcast_delta=True)
        old.graphs.unpersist()
        phases["insert_total"].append(round(time.monotonic() - t0, 3))

        handle.pairs = (found if handle.pairs is None
                        else handle.pairs.unionByName(found))
        handle.batches += 1
        phases["batch_total"].append(round(time.monotonic() - t_b0, 3))

    # sub-split probes of the FORMER insert shape (r15 session 1), kept
    # for before/after comparison: "insert_keys_collect" replicates the
    # union-keys detection query the operator ran before the
    # single-collect change landed (the live operator no longer issues
    # it), and "insert_materialize" times a standalone insert
    from lanterndb_spark.operators.hnsw import _cluster_route_expr, _shard_expr

    for bi in (2 + N_STEADY, 2 + N_STEADY + 0):
        batch = batches[-1].select("vec_id", "embedding")
        index = handle.index
        route = (_shard_expr(index.id_col, index.num_shards)
                 if index.centroids is None else
                 _cluster_route_expr(spark, index.centroids, index.vec_col,
                                     index.metric,
                                     replicas=getattr(index, "replicas", 1)))
        src = batch.select(
            F.col(index.id_col).cast("bigint").alias("__gid"),
            F.col(index.vec_col).alias("__gv"), route.alias("__shard"))
        packed = src.groupBy("__shard").agg(
            F.collect_list(F.struct("__gid", "__gv")).alias("__items"))
        t0 = time.monotonic()
        packed.select(F.col("__shard").alias("k"), F.lit(True).alias("t")) \
            .unionByName(index.graphs.select(
                F.col("shard").alias("k"), F.lit(False).alias("t"))).collect()
        phases["insert_keys_collect"].append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        nxt = hnsw_insert(index, batch, broadcast_delta=True)
        phases["insert_materialize"].append(
            round(time.monotonic() - t0, 3))
        nxt.graphs.unpersist()

    doc = {
        "harness": f"{N_STEADY} steady 64-row micro-batches over sf0.1 "
                   "embeddings; writer() phases replicated inline; "
                   "medians below",
        "medians_s": {k: round(statistics.median(v), 3)
                      for k, v in phases.items() if v},
        "samples_s": phases,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["medians_s"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
