"""hnsw_search_df smoke at the 2M tier: query volume scales, per-task
memory does not.

Runs a cluster-routed 2M x 64 index, ships CP_NQ queries as a
DataFrame through hnsw_search_df, then reads back every reused Python
worker's high-water RSS (ru_maxrss). Run twice in SEPARATE processes
(fresh workers, so the high-water mark belongs to that batch size):

    CP_NQ=1000  python tools/searchdf_smoke.py
    CP_NQ=10000 python tools/searchdf_smoke.py

Flat worker peak RSS across the two = the lockstep wave-set chunking
(search_many caps state at _CHUNK queries) holds at eval-pass volumes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark  # noqa: E402


def worker_rss(df):
    """Max + median high-water RSS (MB) across the reused Python
    workers that ran this session's tasks."""
    def probe(batches):
        import resource
        for _ in batches:
            pass
        kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        yield pd.DataFrame({"pid": [os.getpid()], "rss_kb": [int(kb)]})

    rows = df.mapInPandas(probe, "pid long, rss_kb long").collect()
    by_pid = {}
    for r in rows:
        by_pid[r["pid"]] = max(by_pid.get(r["pid"], 0), r["rss_kb"])
    vals = sorted(by_pid.values())
    return {
        "workers": len(vals),
        "rss_max_mb": round(vals[-1] / 1024, 1),
        "rss_median_mb": round(vals[len(vals) // 2] / 1024, 1),
    }


def main():
    n = int(os.environ.get("CP_N", "2000000"))
    nq = int(os.environ.get("CP_NQ", "10000"))
    d = 64
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_smoke import gen  # reuse the persisted 2M parquet

    spark = get_spark(app_name="searchdf-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = gen(spark, n, 1000, dim=d)
    emb = emb.persist()
    emb.count()

    from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

    t0 = time.monotonic()
    index = build_hnsw(
        emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
        seed=42,
    )
    build_s = time.monotonic() - t0

    rng = np.random.default_rng(11)
    picks = rng.integers(0, n, size=nq)
    qdf = (
        spark.createDataFrame(
            [(int(i), int(p)) for i, p in enumerate(picks)],
            "q_id bigint, vec_id bigint",
        )
        .join(emb.select("vec_id", "embedding"), on="vec_id")
        .select("q_id", F.col("embedding").alias("query"))
        .persist()
    )
    qdf.count()

    t0 = time.monotonic()
    got = hnsw_search_df(index, qdf, k=10, ef=64)
    nres = got.count()
    search_s = time.monotonic() - t0

    # spot recall on 20 of the queries vs exact
    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k,
    )
    spot = {int(q) for q in rng.choice(nq, size=20, replace=False)}
    got_spot = _collect_by_query(
        got.filter(F.col("q_id").isin(sorted(spot))), "vec_id"
    )
    emb_rows = {int(r["q_id"]): [float(x) for x in r["query"]]
                for r in qdf.filter(F.col("q_id").isin(sorted(spot))).collect()}
    qs = [emb_rows[q] for q in sorted(spot)]
    truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
    rec = sum(
        recall_at_k(got_spot.get(q, []), truth.get(i, []))
        for i, q in enumerate(sorted(spot))
    ) / len(spot)

    rss = worker_rss(index.graphs)
    print(json.dumps({
        "n": n, "nq": nq, "shards": index.num_shards, "build_s": round(build_s, 1),
        "search_s": round(search_s, 1), "result_rows": nres,
        "spot_recall_at_10": round(rec, 3), **rss,
    }))


if __name__ == "__main__":
    main()
