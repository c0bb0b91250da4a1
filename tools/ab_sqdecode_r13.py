#!/usr/bin/env python
"""Paired A/B for the r13 sq8 decode-in-kernel change: the ivfsq coarse
pass used to score the Catalyst-dequantized float column, which crosses
the Arrow boundary at 8 bytes/dim — the same bytes as raw ivf, wasting
sq8's layout. The change ships the int8 codes + one scale double and
decodes in the kernel (bit-exact; pinned by
test_ivfsq_arrow_kernel_decodes_codes_in_kernel).

Both variants live in the SAME codebase (float = ivf_search_df over the
dequantized column, codes = the base_decode hook), so this interleaves
them across alternating fresh JVMs — A,B,A,B — with an in-arm dgemm
clock probe per JVM, because this host's clock swings 2x between
sessions and unpaired cross-JVM walls are not comparable
(lanterndb-spark measurement hygiene, r11/r12).

Usage: python tools/ab_sqdecode_r13.py            # wrapper
       python tools/ab_sqdecode_r13.py --arm codes|float
Knobs: AB_NVEC (default 2,000,000), AB_NQ (2,000), AB_DIM (768),
AB_REPS (2 per variant).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "ab_sqdecode_r13.json")

N_VEC = int(os.environ.get("AB_NVEC", "2000000"))
N_Q = int(os.environ.get("AB_NQ", "2000"))
DIM = int(os.environ.get("AB_DIM", "768"))
REPS = int(os.environ.get("AB_REPS", "2"))
NLIST = 256
NPROBE = 32
KK = 100  # k * refine of the steering A/B (k=10, refine=10)


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

    from lanterndb_spark.operators.ivf import IvfIndex, build_ivf, ivf_search_df
    from lanterndb_spark.operators.sq import sq8_quantize, sq8_dequantize
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name=f"sqdecode-{which}")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=DIM)
    emb = emb.select("vec_id", "embedding")
    raw = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
    deq = sq8_dequantize(
        sq8_quantize(raw.assigned, "embedding"), "embedding_sq8", "__sq_deq"
    )
    idx = IvfIndex(deq, raw.centroids, "__sq_deq")
    idx.assigned.persist().count()

    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, DIM))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    if which == "codes":
        code_col, scale_col = "embedding_sq8", "embedding_sq8_scale"

        def _decode(bpdf):
            X = np.asarray(bpdf[code_col].tolist(), dtype=np.float64)
            X *= bpdf[scale_col].to_numpy(dtype=np.float64)[:, None]
            return X

        decode = ([code_col, scale_col], _decode)
    else:
        decode = None

    walls = []
    for _ in range(2):
        t1 = time.monotonic()
        res = ivf_search_df(
            idx, qdf, k=KK, nprobe=NPROBE, id_col="vec_id",
            impl="arrow", unique_q_ids=True, base_decode=decode,
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
        for which in ("float", "codes"):
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
    f = [r for r in runs if r["arm"] == "float"]
    c = [r for r in runs if r["arm"] == "codes"]
    best_f, best_c = min(r["warm_s"] for r in f), min(r["warm_s"] for r in c)
    rec = {
        "what": "interleaved fresh-JVM A/B of the sq8 coarse scan: "
                "float column through Arrow vs int8 codes decoded "
                "in-kernel (r13 change). Same codebase, same corpus, "
                "same build seed; only the boundary layout differs.",
        "shape": {"n_vec": N_VEC, "nq": N_Q, "dim": DIM, "kk": KK,
                  "nlist": NLIST, "nprobe": NPROBE, "impl": "arrow"},
        "runs": runs,
        "best_warm_float_s": best_f,
        "best_warm_codes_s": best_c,
        "speedup_codes_over_float": round(best_f / best_c, 3),
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(rec, fh, indent=2)
    print("wrote", OUT_PATH)
    print(json.dumps({k: rec[k] for k in (
        "best_warm_float_s", "best_warm_codes_s",
        "speedup_codes_over_float")}))


if __name__ == "__main__":
    main()
