#!/usr/bin/env python
"""50M-vector smoke, round 13 — completes the 2M -> 10M -> 20M chain
one tier up (VERDICT r12 items 1 + 5) with BOTH the ivf scan paths and
the hnsw leg the r12 tool skipped on a budget argument:

  ivf    build_ivf nlist=512, persisted assigned, 2x 10k-query
         batches (nprobe=64 — the same 1/8 probed fraction as the 20M
         smoke's 32/256), spot recall vs exact brute force.
  hnsw   cluster-routed 1024-shard graph build (m=16, efc=64 — the
         exact geometry of the 20M point, smoke_20m.py /
         replicas_ab.py, so the build-linearity claim is one scaling
         law, not two tools), one 10k-query batch at nprobe=64 (the
         same 1/16 probed fraction as the 20M run's 32/512), spot
         recall. 50M/1024 ~= 49k rows/shard — per-shard geometry
         corpus-size-invariant, which is the property being proven.

Reference anchor: the reference grew an external index server
(lantern_cli/src/external_index/server.rs:311-435) because single-node
build memory was its ceiling; this smoke is the no-ceiling evidence at
2.5x the largest previously measured corpus.

Hygiene (the r12 lesson — smoke_50m_r12.json never landed): the output
JSON is (re)written after EVERY stage, so a timeout still leaves a
valid, truthful artifact with "complete": false and whatever stages
finished. A single-thread dgemm clock probe is recorded before the JVM
starts (this host's clock varies per session; absolute walls are only
comparable within one).

Usage: python tools/smoke_50m_r13.py [ivf] [hnsw]   (default: both)
       AB_NVEC / AB_NQ / AB_HEAP env override the defaults.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "smoke_50m_r13.json")

N_VEC = int(os.environ.get("AB_NVEC", "50000000"))
N_Q = int(os.environ.get("AB_NQ", "10000"))
N_SPOT = 50
NLIST = 512
NPROBE_IVF = 64     # 1/8 of nlist, the 20M smoke's probed fraction
HNSW_SHARDS = 1024
NPROBE_HNSW = 64    # 1/16 of shards, the 20M run's probed fraction


def clock_probe() -> float:
    """Single-thread dgemm GFLOP/s, probed before the JVM contends."""
    import numpy as np

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    n = 1024
    a = np.random.default_rng(0).standard_normal((n, n))
    b = np.random.default_rng(1).standard_normal((n, n))
    a @ b  # warm
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        a @ b
    dt = time.perf_counter() - t0
    return round(2.0 * n**3 * reps / dt / 1e9, 1)


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

    stages = set(a for a in sys.argv[1:] if not a.startswith("-"))
    if not stages:
        stages = {"ivf", "hnsw"}

    gflops = clock_probe()
    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "64g"))
    import scale_smoke

    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name="smoke-50m-r13")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {
        "n_vec": N_VEC, "nq": N_Q, "dim": 64,
        "clock_dgemm_gflops": gflops, "complete": False, "stages": {},
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
    timed("gen", lambda: scale_smoke.gen(spark, N_VEC, 1000, dim=64) and 0)
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=64)
    emb = emb.select("vec_id", "embedding")

    # shared spot-recall setup: 50 sampled queries, exact brute truth
    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    truth = timed("exact_truth_50q", lambda: exact_topk_batch(
        emb, "embedding", qs, k=10, id_col="vec_id"))
    spot = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
    )

    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, 64))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    def spot_recall(search):
        res = search(spot)
        got = _collect_by_query(res, "vec_id")
        release(res)
        return round(
            sum(recall_at_k(got.get(i, []), truth[i]) for i in range(len(qs)))
            / len(qs), 4)

    if "ivf" in stages:
        from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df

        idx = timed("ivf_build_512", lambda: build_ivf(
            emb, "embedding", nlist=NLIST, seed=42))
        timed("ivf_persist_assigned", lambda: idx.assigned.persist().count())

        def batch():
            res = ivf_search_df(
                idx, qdf, k=10, nprobe=NPROBE_IVF, id_col="vec_id",
                impl="arrow", unique_q_ids=True,
            )
            n = res.count()
            release(res)
            return n

        for i in (1, 2):
            timed(f"ivf_batch10k_{i}", batch)
        rec["ivf_ms_per_q_warm"] = round(
            min(rec["stages"]["ivf_batch10k_1"],
                rec["stages"]["ivf_batch10k_2"]) / N_Q * 1000, 3)
        rec["ivf_recall_at_10"] = spot_recall(lambda sq: ivf_search_df(
            idx, sq, k=10, nprobe=NPROBE_IVF, id_col="vec_id",
            unique_q_ids=True))
        rec["worker_peak_rss_mb_after_ivf"] = round(
            worker_peak_rss_mb(spark), 1)
        flush()
        idx.assigned.unpersist()

    if "hnsw" in stages:
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

        hidx = {}

        def hbuild():
            hidx["i"] = build_hnsw(
                emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
                num_shards=HNSW_SHARDS, routing="cluster", seed=42,
            )
            return hidx["i"].graphs.count()

        timed(f"hnsw_build_{HNSW_SHARDS}shard", hbuild)

        def hbatch():
            res = hnsw_search_df(
                hidx["i"], qdf, k=10, ef=64, nprobe=NPROBE_HNSW,
                unique_q_ids=True,
            )
            n = res.count()
            release(res)
            return n

        timed(f"hnsw_batch10k_np{NPROBE_HNSW}", hbatch)
        rec["hnsw_ms_per_q"] = round(
            rec["stages"][f"hnsw_batch10k_np{NPROBE_HNSW}"] / N_Q * 1000, 3)
        rec["hnsw_recall_at_10"] = spot_recall(lambda sq: hnsw_search_df(
            hidx["i"], sq, k=10, ef=64, nprobe=NPROBE_HNSW,
            unique_q_ids=True))
        rec["worker_peak_rss_mb_after_hnsw"] = round(
            worker_peak_rss_mb(spark), 1)
        flush()
        hidx["i"].graphs.unpersist()

    rec["complete"] = stages == {"ivf", "hnsw"}
    rec["stages_run"] = sorted(stages)
    flush()
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
