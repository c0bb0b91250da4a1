#!/usr/bin/env python
"""768d recall-matched operating points (VERDICT r13, Next round #3).

`ab_dim768_r13.json` measured the four ANN backends at 2M x 768d under
64d-era knobs (nprobe 32/25, ef 64, refine 10) and got walls at recalls
nobody would ship (0.24-0.48). The cross-backend RANKING at matched
knobs is not the steering question — ms/q AT MATCHED RECALL is. This
tool walks an ascending knob grid per backend, measures spot recall@10
per config (100 sampled queries vs in-arm exact truth, same seed across
arms), picks the first configs reaching >= 0.8 and >= 0.9, and times a
query batch at exactly those operating points.

Corpus note (honesty): the 2M x 768d corpus is iid standard normal —
isotropic, no manifold structure, the known WORST case for cluster
pruning at high dim (concentration of distances). Real embedding sets
are far more clusterable, so these walls are lower bounds on pruning
quality; the artifact also records the probed-fraction at each op point
so the reader can see how close to a full scan each backend must go.

Arms (fresh JVM each, in-arm dgemm clock probe, JSON re-written after
every arm):
  ivf    grid over nprobe
  ivfsq  grid over nprobe at refine=10 (kk=100, block-safe), +refine=30
         tail configs if the quantized ordering caps recall
  ivfpq  grid over (nprobe, refine) — ADC ordering is lossy, refine
         does real work here; refine capped at 30 (kk=300) to stay
         under the per-(cluster,salt) block (~977 rows at salt 8,
         the r13 refine=100 pathology)
  hnsw   grid over (nprobe, ef) on a prebuilt 400-shard cluster-routed
         graph; timing batches capped at 256 queries (high-nprobe
         graph walks are seconds per query)

Usage: python tools/recall_ops_r14.py [--only ivf,hnsw]
       python tools/recall_ops_r14.py --arm ivf
Knobs: AB_NVEC (2,000,000), AB_NQ (2,000), AB_HEAP (48g).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "recall_ops_r14.json")

N_VEC = int(os.environ.get("AB_NVEC", "2000000"))
N_Q = int(os.environ.get("AB_NQ", "2000"))
N_Q_HNSW = int(os.environ.get("AB_NQ_HNSW", "256"))
DIM = 768
NLIST = 256
N_SPOT = 100
K = 10
HNSW_SHARDS = 400
TARGETS = (0.8, 0.9)

GRIDS = {
    "ivf": [{"nprobe": np} for np in (32, 64, 96, 128, 160, 192, 224, 256)],
    "ivfsq": (
        [{"nprobe": np, "refine": 10}
         for np in (32, 64, 96, 128, 160, 192, 224, 256)]
        + [{"nprobe": 256, "refine": 30}]
    ),
    "ivfpq": [
        {"nprobe": 32, "refine": 10}, {"nprobe": 64, "refine": 10},
        {"nprobe": 64, "refine": 30}, {"nprobe": 128, "refine": 30},
        {"nprobe": 192, "refine": 30}, {"nprobe": 256, "refine": 30},
    ],
    "hnsw": [
        {"nprobe": 25, "ef": 64}, {"nprobe": 50, "ef": 64},
        {"nprobe": 50, "ef": 128}, {"nprobe": 100, "ef": 128},
        {"nprobe": 100, "ef": 256}, {"nprobe": 200, "ef": 256},
        {"nprobe": 400, "ef": 256},
    ],
}


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


def arm(which: str) -> dict:
    import numpy as np

    gflops = clock_probe()
    os.environ.setdefault(
        "SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "48g"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_smoke

    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name=f"recall-ops-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=DIM)
    emb = emb.select("vec_id", "embedding")

    rec: dict = {"arm": which, "clock_dgemm_gflops": gflops}

    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    t0 = time.monotonic()
    truth = exact_topk_batch(emb, "embedding", qs, k=K, id_col="vec_id")
    rec["exact_truth_s"] = round(time.monotonic() - t0, 1)
    spot = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
    ).persist()
    spot.count()
    nq = N_Q_HNSW if which == "hnsw" else N_Q
    rng = np.random.default_rng(77)
    qm = rng.standard_normal((nq, DIM))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(nq)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    # ---- build once -----------------------------------------------------
    t0 = time.monotonic()
    if which == "ivf":
        from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df

        idx = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
        idx.assigned.persist().count()

        def search(q, cfg):
            return ivf_search_df(
                idx, q, k=K, nprobe=cfg["nprobe"], id_col="vec_id",
                impl="arrow", unique_q_ids=True)

    elif which == "ivfsq":
        from lanterndb_spark.operators.ivf import (
            IvfIndex, build_ivf, ivfsq_search_df,
        )
        from lanterndb_spark.operators.sq import sq8_quantize

        raw = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
        idx = IvfIndex(
            sq8_quantize(raw.assigned, "embedding"), raw.centroids,
            "embedding")
        idx.assigned.persist().count()

        def search(q, cfg):
            return ivfsq_search_df(
                idx, q, k=K, nprobe=cfg["nprobe"], refine=cfg["refine"],
                id_col="vec_id", unique_q_ids=True)

    elif which == "ivfpq":
        from lanterndb_spark.operators.ivf import (
            IvfIndex, build_ivf, ivfpq_search_df,
        )
        from lanterndb_spark.operators.pq import quantize, train_codebook

        raw = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
        cb = train_codebook(emb, "embedding", splits=96, clusters=256,
                            seed=42)
        idx = IvfIndex(
            quantize(raw.assigned, "embedding", cb), raw.centroids,
            "embedding")
        idx.assigned.persist().count()

        def search(q, cfg):
            return ivfpq_search_df(
                idx, cb, q, k=K, nprobe=cfg["nprobe"],
                refine=cfg["refine"], id_col="vec_id", unique_q_ids=True)

    elif which == "hnsw":
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

        idx = build_hnsw(
            emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
            num_shards=HNSW_SHARDS, routing="cluster", seed=42,
        )
        idx.graphs.persist().count()

        def search(q, cfg):
            return hnsw_search_df(
                idx, q, k=K, ef=cfg["ef"], nprobe=cfg["nprobe"],
                unique_q_ids=True)

    else:
        raise SystemExit(f"unknown arm {which}")
    rec["build_s"] = round(time.monotonic() - t0, 1)

    # ---- recall sweep (spot queries, cheap) -----------------------------
    sweep = []
    op_points = {}
    for cfg in GRIDS[which]:
        t1 = time.monotonic()
        res = search(spot, cfg)
        got = _collect_by_query(res, "vec_id")
        release(res)
        r = round(
            sum(recall_at_k(got.get(i, []), truth[i])
                for i in range(len(qs))) / len(qs), 4)
        sweep.append({**cfg, "recall_at_10": r,
                      "spot_wall_s": round(time.monotonic() - t1, 1)})
        print(f"  {which} {cfg} recall {r}", flush=True)
        for tgt in TARGETS:
            if r >= tgt and tgt not in op_points:
                op_points[tgt] = dict(cfg)
        if all(t in op_points for t in TARGETS):
            break
    rec["sweep"] = sweep

    # ---- time the chosen operating points -------------------------------
    frac = {"hnsw": HNSW_SHARDS}.get(which, NLIST)
    rec["op_points"] = {}
    seen = {}
    for tgt in TARGETS:
        cfg = op_points.get(tgt)
        entry = {"target_recall": tgt, "config": cfg}
        if cfg is None:
            entry["note"] = (
                "grid exhausted below target — quantized ordering caps "
                "recall on this corpus at these knobs")
        else:
            key = json.dumps(cfg, sort_keys=True)
            if key in seen:
                entry.update(seen[key])
            else:
                walls = []
                for _ in range(2):
                    t1 = time.monotonic()
                    res = search(qdf, cfg)
                    res.count()
                    walls.append(round(time.monotonic() - t1, 1))
                    release(res)
                entry["batch_walls_s"] = walls
                entry["nq_timed"] = nq
                entry["ms_per_q_warm"] = round(min(walls) / nq * 1000, 3)
                entry["probed_fraction"] = round(cfg["nprobe"] / frac, 3)
                seen[key] = {
                    k: entry[k] for k in
                    ("batch_walls_s", "nq_timed", "ms_per_q_warm",
                     "probed_fraction")}
        rec["op_points"][str(tgt)] = entry
    rec["clock_dgemm_gflops_post"] = clock_probe()
    return rec


def main():
    if "--arm" in sys.argv:
        print(json.dumps(arm(sys.argv[sys.argv.index("--arm") + 1])))
        return
    which_arms = ("ivf", "ivfsq", "ivfpq", "hnsw")
    if "--only" in sys.argv:
        which_arms = tuple(sys.argv[sys.argv.index("--only") + 1].split(","))
    arms = {}
    rec = {
        "what": "768d recall-matched operating points (VERDICT r13 #3): "
                "per backend, first grid config reaching recall@10 >= "
                "0.8 / 0.9 and ms/q timed THERE. Corpus is iid gaussian "
                "— worst case for cluster pruning; probed_fraction shows "
                "distance to a full scan.",
        "shape": {"n_vec": N_VEC, "dim": DIM, "k": K, "nlist": NLIST,
                  "n_spot": N_SPOT, "nq": N_Q, "nq_hnsw": N_Q_HNSW,
                  "hnsw": {"m": 16, "efc": 64, "shards": HNSW_SHARDS}},
        "grids": GRIDS,
        "arms": arms,
    }
    if "--only" in sys.argv and os.path.exists(OUT_PATH):
        prior = json.load(open(OUT_PATH))
        rec["arms"] = arms = dict(prior.get("arms", {}))
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    for which in which_arms:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        print(f"arm {which} (fresh JVM) ...", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", which],
            env=env, capture_output=True, text=True, timeout=14400,
            cwd=REPO,
        )
        line = [l for l in proc.stdout.strip().splitlines()
                if l.strip().startswith("{")]
        if not line:
            arms[which] = {
                "error": (proc.stdout[-1500:] + proc.stderr[-1500:])}
        else:
            arms[which] = json.loads(line[-1])
        print(" ", json.dumps(arms[which])[:600], flush=True)
        with open(OUT_PATH, "w") as f:  # flush after every arm
            json.dump(rec, f, indent=2)
    print("wrote", OUT_PATH)


if __name__ == "__main__":
    main()
