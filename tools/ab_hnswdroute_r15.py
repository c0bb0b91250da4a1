#!/usr/bin/env python
"""Interleaved A/B of hnsw_search_df's driver prep+route
(broadcast_queries=True) vs the executor prep/route path on the
streaming-semdedup cross-search shape: a 64-row micro-batch queried
against a 448-row cos graph, checkpointed like the handle does. Also
asserts row identity between the arms. Writes
spark-warehouse/hnswdroute_ab_r15.json.
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
OUT = os.path.join(ROOT, "spark-warehouse", "hnswdroute_ab_r15.json")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        la = os.getloadavg()
        conditions = {"load_1m": round(la[0], 2), "load_5m": round(la[1], 2)}
    except OSError:
        conditions = {}
    spark = get_spark(app_name="ab-hnswdroute-r15")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    emb.cache().count()

    from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

    schema = emb.select("vec_id", "embedding").schema
    rows = emb.select("vec_id", "embedding").limit(512).collect()
    idx = build_hnsw(
        spark.createDataFrame(rows[:448], schema), "embedding",
        id_col="vec_id", metric="cos", m=16, ef_construction=64,
        seed=42, num_shards=4)
    batch = spark.createDataFrame(rows[448:512], schema)
    qdf = batch.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("query"))

    def result(flag):
        out = hnsw_search_df(idx, qdf, k=10, ef=64, unique_q_ids=True,
                             broadcast_queries=flag)
        return sorted((r[0], r[1], round(r[2], 9)) for r in out.collect())

    assert result(True) == result(False), "arms disagree"

    def body(flag):
        out = (hnsw_search_df(idx, qdf, k=10, ef=64, unique_q_ids=True,
                              broadcast_queries=flag)
               .filter(F.col("dist") <= 0.2))
        out.localCheckpoint(eager=True)

    body(True); body(False)
    td, te = [], []
    for _ in range(REPS):
        t0 = time.monotonic(); body(True); td.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic(); body(False); te.append(round(time.monotonic() - t0, 3))
    doc = {
        "harness": "interleaved same-session A/B on the semdedup "
                   "cross-search shape (64-row batch vs 448-row cos "
                   f"graph, eager checkpoint); medians over {REPS} "
                   "paired reps after one warm rep each; rows asserted "
                   "identical",
        "rows_identical": True,
        "run_conditions": conditions,
        "driver_route_s": statistics.median(td), "samples_driver": td,
        "executor_route_s": statistics.median(te), "samples_executor": te,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("driver_route_s", "executor_route_s")}))
    spark.stop()


if __name__ == "__main__":
    main()
