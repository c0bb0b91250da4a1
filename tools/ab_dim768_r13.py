#!/usr/bin/env python
"""Realistic-dimension A/B (VERDICT r12 item 2): every ANN wall/recall
number through round 12 was measured at 64d, but the models the
reference ships runtimes for (CLIP / e5 / bge class,
lantern_cli/src/embeddings/core/ort_runtime.rs:285-300) emit 512-1024d,
and the reference caps dim at 2000 (lantern_hnsw/src/hnsw/options.h:15).
The PQ story in particular hinges on dim: the r12 cold-device A/B found
ivfpq LOSING 1.73x at 64d because ADC compute, not bandwidth, was the
wall — its own conclusion says the crossover flips "at higher dims
where the f32 decode grows while codes stay 1 B/subvector"
(scan.c:75-81, pqvec.c:16-28). At 768d the raw coarse scan is 12x the
bytes while PQ codes stay 96 B/vector (8 dims/subvector, the same
ratio as the 64d splits=8 setup) — this measures whether that's enough.

Arms (each in its OWN subprocess — fresh JVM, so no storage-state
contamination between backends; in-arm dgemm clock probe recorded):

  ivf    build nlist=256; 2x 2k-query batches nprobe=32 (1/8).
  ivfsq  same coarse layout over int8 codes + exact re-rank
         (refine=100 = 10k).
  ivfpq  splits=96 x 256 clusters ADC + exact re-rank (refine=100).
  hnsw   cluster-routed 400-shard graph (m=16, efc=64, 5k rows/shard);
         2k-query batch ef=64 nprobe=25 (1/16, the 20M ratio).

Each arm also writes its coarse-scan columns to parquet and records
the on-disk MB — the scan-byte story (raw f32 embedding vs sq8 codes
vs pq codes) measured, not asserted, at 768d. Recall@10 is spot-checked
on 50 sampled queries against in-arm exact brute force (identical seed
-> identical queries across arms).

Usage: python tools/ab_dim768_r13.py                 # wrapper, all arms
       python tools/ab_dim768_r13.py --arm ivfpq     # inner, one JVM
Knobs: AB_NVEC (default 2,000,000), AB_NQ (2,000), AB_HEAP (48g).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "ab_dim768_r13.json")
SCRATCH = os.path.join(REPO, "spark-warehouse", "ab_dim768_scratch")

N_VEC = int(os.environ.get("AB_NVEC", "2000000"))
N_Q = int(os.environ.get("AB_NQ", "2000"))
DIM = 768
NLIST = 256
NPROBE = 32
# refine multiplies k into the coarse candidate window (kk = k*refine).
# MUST stay well under rows-per-(cluster,salt) block (~n/nlist/salt =
# 977 here): the first run used 100 -> kk=1000 > block, so the coarse
# per-block cut pruned NOTHING and the full probed volume (500M rows)
# hit the global window — ivfsq read 175 ms/q, 18x plain ivf. That
# reading is kept in the artifact under arms_refine100 as a documented
# pathology; the steering comparison uses refine=10 (kk=100, ~10x the
# final k — a generous exact-re-rank window).
REFINE = int(os.environ.get("AB_REFINE", "10"))
N_SPOT = 50
HNSW_SHARDS = 400
HNSW_NPROBE = 25


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


def du_mb(path: str) -> float:
    out = subprocess.run(["du", "-sm", path], capture_output=True, text=True)
    return float(out.stdout.split()[0])


def arm(which: str) -> dict:
    import numpy as np

    gflops = clock_probe()
    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "48g"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_smoke

    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name=f"dim768-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=DIM)
    emb = emb.select("vec_id", "embedding")

    rec: dict = {"arm": which, "clock_dgemm_gflops": gflops}

    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    t0 = time.monotonic()
    truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
    rec["exact_truth_s"] = round(time.monotonic() - t0, 1)
    spot = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
    )
    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, DIM))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    def timed_batches(search, persist_df):
        persist_df.persist().count()
        walls = []
        for _ in range(2):
            t1 = time.monotonic()
            res = search(qdf)
            res.count()
            walls.append(round(time.monotonic() - t1, 1))
            release(res)
        rec["batch2k_walls_s"] = walls
        rec["ms_per_q_warm"] = round(min(walls) / N_Q * 1000, 3)
        got_res = search(spot)
        got = _collect_by_query(got_res, "vec_id")
        release(got_res)
        rec["recall_at_10"] = round(
            sum(recall_at_k(got.get(i, []), truth[i]) for i in range(len(qs)))
            / len(qs), 4)

    def scan_bytes(df, cols, label):
        path = os.path.join(SCRATCH, f"{which}_{label}")
        df.select(*cols).write.mode("overwrite").parquet(path)
        rec[f"scan_parquet_mb_{label}"] = du_mb(path)

    if which == "ivf":
        from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df

        t0 = time.monotonic()
        idx = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
        rec["build_s"] = round(time.monotonic() - t0, 1)
        scan_bytes(idx.assigned, ["cluster_id", "vec_id", "embedding"], "coarse")
        timed_batches(
            lambda q: ivf_search_df(
                idx, q, k=10, nprobe=NPROBE, id_col="vec_id",
                impl="arrow", unique_q_ids=True),
            idx.assigned,
        )

    elif which == "ivfsq":
        from lanterndb_spark.operators.ivf import (
            IvfIndex, build_ivf, ivfsq_search_df,
        )
        from lanterndb_spark.operators.sq import sq8_quantize

        t0 = time.monotonic()
        raw = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
        coded = IvfIndex(
            sq8_quantize(raw.assigned, "embedding"), raw.centroids, "embedding"
        )
        coded.assigned.count()
        rec["build_s"] = round(time.monotonic() - t0, 1)
        code_cols = [c for c in coded.assigned.columns if c != "embedding"]
        scan_bytes(coded.assigned, code_cols, "coarse")
        timed_batches(
            lambda q: ivfsq_search_df(
                coded, q, k=10, nprobe=NPROBE, refine=REFINE,
                id_col="vec_id", unique_q_ids=True),
            coded.assigned,
        )

    elif which == "ivfpq":
        from lanterndb_spark.operators.ivf import (
            IvfIndex, build_ivf, ivfpq_search_df,
        )
        from lanterndb_spark.operators.pq import quantize, train_codebook

        t0 = time.monotonic()
        raw = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
        cb = train_codebook(
            emb, "embedding", splits=96, clusters=256, seed=42
        )
        coded = IvfIndex(
            quantize(raw.assigned, "embedding", cb), raw.centroids, "embedding"
        )
        coded.assigned.count()
        rec["build_s"] = round(time.monotonic() - t0, 1)
        code_cols = [c for c in coded.assigned.columns if c != "embedding"]
        scan_bytes(coded.assigned, code_cols, "coarse")
        timed_batches(
            lambda q: ivfpq_search_df(
                coded, cb, q, k=10, nprobe=NPROBE, refine=REFINE,
                id_col="vec_id", unique_q_ids=True),
            coded.assigned,
        )

    elif which == "hnsw":
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

        t0 = time.monotonic()
        idx = build_hnsw(
            emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
            num_shards=HNSW_SHARDS, routing="cluster", seed=42,
        )
        idx.graphs.count()
        rec["build_s"] = round(time.monotonic() - t0, 1)
        timed_batches(
            lambda q: hnsw_search_df(
                idx, q, k=10, ef=64, nprobe=HNSW_NPROBE, unique_q_ids=True),
            idx.graphs,
        )

    else:
        raise SystemExit(f"unknown arm {which}")

    return rec


def main():
    if "--arm" in sys.argv:
        print(json.dumps(arm(sys.argv[sys.argv.index("--arm") + 1])))
        return
    which_arms = ("ivf", "ivfsq", "ivfpq", "hnsw")
    if "--only" in sys.argv:
        which_arms = tuple(
            sys.argv[sys.argv.index("--only") + 1].split(","))
    arms = {}
    rec = {
        "what": "768d backend A/B at 2M vectors (VERDICT r12 item 2): "
                "does PQ's 1 B/subvector coarse scan earn its keep at "
                "realistic embedding dims? Fresh JVM per arm.",
        "shape": {"n_vec": N_VEC, "nq": N_Q, "dim": DIM, "k": 10,
                  "nlist": NLIST, "nprobe": NPROBE, "refine": REFINE,
                  "hnsw": {"m": 16, "efc": 64, "shards": HNSW_SHARDS,
                           "ef": 64, "nprobe": HNSW_NPROBE}},
        "arms": arms,
    }
    if "--only" in sys.argv and os.path.exists(OUT_PATH):
        # partial re-run: keep the other arms' readings from the prior
        # artifact (refine changes don't touch ivf/hnsw)
        prior = json.load(open(OUT_PATH))
        rec.update({k: v for k, v in prior.items() if k != "shape"})
        rec["arms"] = arms = dict(prior.get("arms", {}))
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    for which in which_arms:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        print(f"arm {which} (fresh JVM) ...", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", which],
            env=env, capture_output=True, text=True, timeout=7200, cwd=REPO,
        )
        line = [l for l in proc.stdout.strip().splitlines()
                if l.strip().startswith("{")]
        if not line:
            arms[which] = {"error": (proc.stdout[-1500:] + proc.stderr[-1500:])}
        else:
            arms[which] = json.loads(line[-1])
        print(" ", arms[which], flush=True)
        with open(OUT_PATH, "w") as f:  # flush after every arm (r12 lesson)
            json.dump(rec, f, indent=2)
    print("wrote", OUT_PATH)


if __name__ == "__main__":
    main()
