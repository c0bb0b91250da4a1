#!/usr/bin/env python
"""50M-vector ivf smoke — one tier above the 20M evidence (r11/r12):
gen (cached parquet), build_ivf, persisted assigned, 2x 10k-query
batches through ivf_search_df, spot recall vs exact brute force, and
the worker peak RSS probe. Writes spark-warehouse/smoke_50m_r12.json.

The point is the same as smoke_20m's: no memory ceiling, linear build,
per-query cost holding — at 2.5x the previously measured corpus. ivf
only (the hnsw build at this tier is ~1h of wall the round budget
doesn't carry; its per-shard geometry is corpus-size-invariant by
construction — 512+ shards of ~40k rows — so the ivf scan paths are
the ones with new information at 50M).

Usage: python tools/smoke_50m_r12.py   [AB_NVEC / AB_NQ / AB_HEAP env]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "smoke_50m_r12.json")

N_VEC = int(os.environ.get("AB_NVEC", "50000000"))
N_Q = int(os.environ.get("AB_NQ", "10000"))
N_SPOT = 50
NLIST = 512
NPROBE = 64  # same probed fraction (1/8) as the 20M smoke's 32/256


def worker_peak_rss_mb(spark) -> float:
    import pandas as pd

    def probe(batches):
        import resource
        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
        yield pd.DataFrame({"mb": [peak]})
        for _ in batches:
            pass

    df = spark.range(64).repartition(64)
    out = df.mapInPandas(probe, "mb double")
    return float(out.agg({"mb": "max"}).first()[0])


def main():
    import numpy as np

    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "64g"))
    import scale_smoke

    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name="smoke-50m")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {"n_vec": N_VEC, "nq": N_Q, "nlist": NLIST,
                 "nprobe": NPROBE, "stages": {}}

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        rec["stages"][label] = round(time.monotonic() - t0, 1)
        print(f"{label}: {rec['stages'][label]}s", flush=True)
        return out

    timed("gen", lambda: scale_smoke.gen(spark, N_VEC, 1000, dim=64) and 0)
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=64)
    emb = emb.select("vec_id", "embedding")

    idx = timed("build_ivf", lambda: build_ivf(emb, "embedding", nlist=NLIST, seed=42))
    timed("persist_assigned", lambda: idx.assigned.persist().count())

    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, 64))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    def batch():
        res = ivf_search_df(
            idx, qdf, k=10, nprobe=NPROBE, id_col="vec_id",
            impl="arrow", unique_q_ids=True,
        )
        n = res.count()
        release(res)
        return n

    for i in (1, 2):
        timed(f"ivf_batch10k_{i}", batch)
    rec["ms_per_q_warm"] = round(
        min(rec["stages"]["ivf_batch10k_1"], rec["stages"]["ivf_batch10k_2"])
        / N_Q * 1000, 3)

    # spot recall vs exact brute force over the full 50M table
    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )

    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    truth = timed("exact_truth", lambda: exact_topk_batch(
        emb, "embedding", qs, k=10, id_col="vec_id"))
    spot = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
    )
    res = ivf_search_df(
        idx, spot, k=10, nprobe=NPROBE, id_col="vec_id", unique_q_ids=True
    )
    got = _collect_by_query(res, "vec_id")
    release(res)
    rec["recall_at_10"] = round(
        sum(recall_at_k(got.get(i, []), truth[i]) for i in range(len(qs)))
        / len(qs), 4)
    rec["worker_peak_rss_mb"] = round(worker_peak_rss_mb(spark), 1)

    with open(OUT_PATH, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
