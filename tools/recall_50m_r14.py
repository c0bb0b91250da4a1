#!/usr/bin/env python
"""Close the 50M recall story (VERDICT r13, Next round #4).

`smoke_50m_r13.json` proved the 50M/1024-shard hnsw leg COMPLETES
(build 2382.7 s, 21.6 ms/q, worker RSS < 1 GB) but answered at spot
recall@10 = 0.648 under the 20M-era probed fraction (nprobe 64/1024 =
1/16). This tool rebuilds the identical geometry (m=16, efc=64,
cluster-routed 1024 shards, replicas=1, seed 42 — same corpus parquet,
`emb_50000000_64`) and walks an ascending nprobe curve on 50 spot
queries until recall@10 >= 0.8, then times a 10k-query batch at that
operating point — turning "it completes" into "it answers well, at a
measured cost".

Replicas note (the verdict's other option): at 20M/512 shards,
replicas=2 lifted recall 0.719 -> 0.862 at the SAME nprobe=64
(`replicas_ab_r12_20m.json`), i.e. multi-assignment buys ~0.14 recall
for 2x build cost and 2x index rows. A replicas=2 run at 50M (~80 min
build) is skipped this round on budget; the nprobe curve measures the
cheaper lever (probe more shards at query time) on the index that
already exists. Both levers compose.

JSON is re-written after every stage (smoke_50m_r13 hygiene), with an
in-process dgemm clock probe recorded before the JVM starts.

Usage: python tools/recall_50m_r14.py
Knobs: AB_NVEC (50,000,000), AB_NQ (10,000), AB_HEAP (64g).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "recall_50m_r14.json")

N_VEC = int(os.environ.get("AB_NVEC", "50000000"))
N_Q = int(os.environ.get("AB_NQ", "10000"))
N_SPOT = 50
HNSW_SHARDS = 1024
# 64 omitted: measured twice already (0.648 in smoke_50m_r13.json and
# 0.648 again in this tool's first launch — recorded below) and each
# curve point shuffles the ~25 GB graph side, which is what filled the
# disk on the first attempt
NPROBE_GRID = (128, 192, 256, 320)
TARGET = 0.8


def clock_probe() -> float:
    import numpy as np

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    n = 1024
    a = np.random.default_rng(0).standard_normal((n, n))
    b = np.random.default_rng(1).standard_normal((n, n))
    a @ b
    t0 = time.perf_counter()
    for _ in range(5):
        a @ b
    dt = time.perf_counter() - t0
    return round(2.0 * n**3 * 5 / dt / 1e9, 1)


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

    gflops = clock_probe()
    os.environ.setdefault(
        "SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "64g"))
    import scale_smoke

    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )
    from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name="recall-50m-r14")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {
        "n_vec": N_VEC, "nq": N_Q, "dim": 64, "shards": HNSW_SHARDS,
        "replicas": 1, "target_recall": TARGET,
        "clock_dgemm_gflops": gflops, "complete": False, "stages": {},
        "curve": [
            # two independent prior measurements of the omitted 64 point
            {"nprobe": 64, "probed_fraction": 0.0625, "recall_at_10": 0.648,
             "source": "smoke_50m_r13.json + first launch of this tool "
                       "(identical 0.648 both times; re-measuring costs a "
                       "25 GB graph shuffle per point)"},
        ],
        "replicas_note": (
            "20M/512 evidence (replicas_ab_r12_20m.json): replicas=2 "
            "lifts recall 0.719->0.862 at the same nprobe=64 for 2x "
            "build; skipped at 50M on budget — this curve measures the "
            "query-time lever instead"),
    }

    def flush():
        with open(OUT_PATH, "w") as f:
            json.dump(rec, f, indent=2)

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        rec["stages"][label] = round(time.monotonic() - t0, 1)
        print(f"{label}: {rec['stages'][label]}s", flush=True)
        flush()
        return out

    flush()
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=64)
    emb = emb.select("vec_id", "embedding")

    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    truth = timed("exact_truth_50q", lambda: exact_topk_batch(
        emb, "embedding", qs, k=10, id_col="vec_id"))
    spot = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
    )

    hidx = {}

    def hbuild():
        hidx["i"] = build_hnsw(
            emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
            num_shards=HNSW_SHARDS, routing="cluster", seed=42,
        )
        return hidx["i"].graphs.count()

    timed(f"hnsw_build_{HNSW_SHARDS}shard", hbuild)

    chosen = None
    for nprobe in NPROBE_GRID:
        t0 = time.monotonic()
        res = hnsw_search_df(
            hidx["i"], spot, k=10, ef=64, nprobe=nprobe,
            unique_q_ids=True)
        got = _collect_by_query(res, "vec_id")
        release(res)
        r = round(
            sum(recall_at_k(got.get(i, []), truth[i])
                for i in range(len(qs))) / len(qs), 4)
        rec["curve"].append({
            "nprobe": nprobe, "probed_fraction": round(nprobe / HNSW_SHARDS, 4),
            "recall_at_10": r,
            "spot_wall_s": round(time.monotonic() - t0, 1)})
        print(f"nprobe {nprobe}: recall {r}", flush=True)
        flush()
        # each eval shuffles the ~25 GB persisted graph side, and Spark
        # only reaps dead shuffle files when the ContextCleaner sees the
        # dependency GC'd — with a 64 GB heap that can be never. Force
        # the GC so consecutive curve points don't stack ~25 GB each on
        # disk (the first launch died on ENOSPC exactly this way).
        spark.sparkContext._jvm.System.gc()
        time.sleep(5)
        if r >= TARGET:
            chosen = nprobe
            break
    rec["op_nprobe"] = chosen

    if chosen is not None:
        rng = np.random.default_rng(77)
        qm = rng.standard_normal((N_Q, 64))
        qdf = spark.createDataFrame(
            [(int(i), qm[i].tolist()) for i in range(N_Q)],
            "q_id long, query array<double>",
        ).persist()
        qdf.count()

        def hbatch():
            res = hnsw_search_df(
                hidx["i"], qdf, k=10, ef=64, nprobe=chosen,
                unique_q_ids=True)
            n = res.count()
            release(res)
            return n

        timed(f"hnsw_batch10k_np{chosen}", hbatch)
        rec["ms_per_q_at_target"] = round(
            rec["stages"][f"hnsw_batch10k_np{chosen}"] / N_Q * 1000, 3)
    rec["worker_peak_rss_mb"] = round(worker_peak_rss_mb(spark), 1)
    rec["complete"] = True
    flush()
    print("wrote", OUT_PATH)


if __name__ == "__main__":
    main()
