"""Surrogate-key q_id wrap overhead at the 2M tier.

hnsw_search_df zips non-integral q_ids to a long (eager localCheckpoint
pins the mapping) and restores them after the merge at one extra join
(operators/hnsw.py _surrogate_key_queries). This smoke runs the SAME
CP_NQ queries long-keyed and string-keyed over a cluster-routed 2M x 64
graph and reports both wall times plus a result-equality check — the
wrap's cost is the checkpoint + restore join, and it must not change a
single answer.

    CP_NQ=50000 python tools/surrogate_smoke.py

Writes spark-warehouse/surrogate_wrap_r10.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark  # noqa: E402


def main():
    n = int(os.environ.get("CP_N", "2000000"))
    nq = int(os.environ.get("CP_NQ", "50000"))
    from scale_smoke import gen

    spark = get_spark(app_name="surrogate-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = gen(spark, n, 1000, dim=64)
    emb = emb.persist()
    emb.count()

    from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

    t0 = time.monotonic()
    index = build_hnsw(
        emb, "embedding", id_col="vec_id", m=8, ef_construction=64,
        routing="cluster", seed=42,
    )
    build_s = round(time.monotonic() - t0, 1)

    rng = np.random.default_rng(11)
    picks = [int(p) for p in rng.integers(0, n, size=nq)]
    qdf = (
        spark.createDataFrame(
            [(i, p) for i, p in enumerate(picks)], "q_id bigint, vec_id bigint"
        )
        .join(emb.select("vec_id", "embedding"), on="vec_id")
        .select("q_id", F.col("embedding").alias("query"))
        .persist()
    )
    qdf.count()
    sdf = qdf.select(
        F.concat(F.lit("ev/"), F.col("q_id").cast("string")).alias("q_id"),
        "query",
    ).persist()
    sdf.count()

    t0 = time.monotonic()
    long_rows = hnsw_search_df(index, qdf, k=10, ef=32, nprobe=8).count()
    long_s = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    str_rows = hnsw_search_df(index, sdf, k=10, ef=32, nprobe=8).count()
    str_s = round(time.monotonic() - t0, 1)

    # equality spot check on 200 queries: restored string ids answer the
    # same (id, dist) sets as their long twins
    spot = [int(i) for i in np.random.default_rng(3).integers(0, nq, size=200)]
    gl = {}
    for r in hnsw_search_df(
        index, qdf.filter(F.col("q_id").isin(spot)), k=10, ef=32, nprobe=8
    ).collect():
        gl.setdefault(int(r["q_id"]), set()).add((r["vec_id"], round(r["dist"], 9)))
    gs = {}
    for r in hnsw_search_df(
        index, sdf.filter(F.col("q_id").isin([f"ev/{i}" for i in spot])),
        k=10, ef=32, nprobe=8,
    ).collect():
        gs.setdefault(int(r["q_id"][3:]), set()).add(
            (r["vec_id"], round(r["dist"], 9))
        )
    equal = gl == gs

    out = {
        "n": n, "nq": nq, "build_s": build_s,
        "long_keyed_s": long_s, "string_keyed_s": str_s,
        "wrap_overhead_pct": round(100.0 * (str_s - long_s) / max(long_s, 1e-9), 1),
        "rows_long": int(long_rows), "rows_string": int(str_rows),
        "spot_equal_200": bool(equal),
    }
    os.makedirs("spark-warehouse", exist_ok=True)
    with open("spark-warehouse/surrogate_wrap_r10.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
