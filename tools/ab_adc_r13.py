#!/usr/bin/env python
"""Paired A/B for the r13 ADC coarse-cut change in ivfpq_search_df:
at >=128d the kernel decodes the code block once and rides a dgemm cut
with a LUT-free per-pair rescore, instead of building per-subvector
LUTs and gather-accumulating `splits` (B, nb) temporaries. Outputs are
bit-identical either way (test_ivfpq_dgemm_and_gather_cuts_bit_identical)
— this measures the wall difference at the 768d steering shape.

Interleaved fresh JVMs (gather, dgemm, gather, dgemm) with in-arm dgemm
clock probes, because this host's clock swings ~2x between sessions.
The route is forced by patching _ADC_DGEMM_MIN_DIM before the call
(captured driver-side into the kernel closure).

Usage: python tools/ab_adc_r13.py            # wrapper
       python tools/ab_adc_r13.py --arm dgemm|gather
Knobs: AB_NVEC (2,000,000), AB_NQ (2,000), AB_DIM (768), AB_REPS (2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "ab_adc_r13.json")

N_VEC = int(os.environ.get("AB_NVEC", "2000000"))
N_Q = int(os.environ.get("AB_NQ", "2000"))
DIM = int(os.environ.get("AB_DIM", "768"))
REPS = int(os.environ.get("AB_REPS", "2"))
NLIST = 256
NPROBE = 32
REFINE = 10


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
    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "48g"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_smoke

    import lanterndb_spark.operators.ivf as ivf_mod
    from lanterndb_spark.operators.ivf import (
        IvfIndex, build_ivf, ivfpq_search_df,
    )
    from lanterndb_spark.operators.pq import quantize, train_codebook
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    ivf_mod._ADC_DGEMM_MIN_DIM = 1 if which == "dgemm" else 10**9

    spark = get_spark(app_name=f"adc-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=DIM)
    emb = emb.select("vec_id", "embedding")
    raw = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
    cb = train_codebook(emb, "embedding", splits=DIM // 8, clusters=256, seed=42)
    idx = IvfIndex(
        quantize(raw.assigned, "embedding", cb), raw.centroids, "embedding"
    )
    idx.assigned.persist().count()

    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, DIM))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    walls = []
    for _ in range(2):
        t1 = time.monotonic()
        res = ivfpq_search_df(
            idx, cb, qdf, k=10, nprobe=NPROBE, refine=REFINE,
            id_col="vec_id", unique_q_ids=True,
        )
        res.count()
        walls.append(round(time.monotonic() - t1, 1))
        release(res)
    return {"arm": which, "clock_dgemm_gflops": gflops,
            "walls_s": walls, "warm_s": min(walls)}


def main():
    if "--arm" in sys.argv:
        print(json.dumps(arm(sys.argv[sys.argv.index("--arm") + 1])))
        return
    runs = []
    for _ in range(REPS):
        for which in ("gather", "dgemm"):
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO
            print(f"arm {which} (fresh JVM) ...", flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", which],
                env=env, capture_output=True, text=True, timeout=3600,
                cwd=REPO,
            )
            line = [l for l in proc.stdout.strip().splitlines()
                    if l.strip().startswith("{")]
            if not line:
                raise RuntimeError(proc.stdout[-1500:] + proc.stderr[-1500:])
            runs.append(json.loads(line[-1]))
            print(" ", runs[-1], flush=True)
    g = min(r["warm_s"] for r in runs if r["arm"] == "gather")
    d = min(r["warm_s"] for r in runs if r["arm"] == "dgemm")
    rec = {
        "what": "interleaved fresh-JVM A/B of ivfpq_search_df's ADC "
                "coarse cut at 768d: per-subvector LUT gather vs "
                "decode-once + dgemm with LUT-free rescore (r13). "
                "Bit-identical outputs; only the cut route differs.",
        "shape": {"n_vec": N_VEC, "nq": N_Q, "dim": DIM, "k": 10,
                  "nlist": NLIST, "nprobe": NPROBE, "refine": REFINE},
        "runs": runs,
        "best_warm_gather_s": g,
        "best_warm_dgemm_s": d,
        "speedup_dgemm_over_gather": round(g / d, 3),
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(rec, fh, indent=2)
    print("wrote", OUT_PATH)
    print(json.dumps({k: rec[k] for k in (
        "best_warm_gather_s", "best_warm_dgemm_s",
        "speedup_dgemm_over_gather")}))


if __name__ == "__main__":
    main()
