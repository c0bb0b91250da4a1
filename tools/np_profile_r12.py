#!/usr/bin/env python
"""nprobe-growth profile for ivf_search_df at the 20M tier (VERDICT r11
item 6): the r11 curve read np96 at ~2-2.4x np64's wall for 1.5x the
scanned rows ("mildly superlinear"), but both readings shared one
long-lived session whose storage state was already shown to
contaminate np96 once (548 s -> 177 s on a dedicated rerun). This
isolates the knob: each nprobe runs in its OWN subprocess (fresh JVM,
same parquet, same build seed, 2 timed batches), so the only thing
that differs between arms is nprobe.

Pass criterion from the VERDICT: np96 within ~1.6x of np64's per-row
cost (wall / rows-scanned) in a fresh session — then the r11
superlinearity was session state and the linear cost model stands; if
it reproduces, the routed-persist level is the next suspect.

Usage: python tools/np_profile_r12.py            # wrapper, both arms
       python tools/np_profile_r12.py --arm 64   # inner, one JVM
Knobs: AB_NVEC (default 20,000,000), AB_NQ (10,000), AB_NLIST (256).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "np_profile_r12.json")

N_VEC = int(os.environ.get("AB_NVEC", "20000000"))
N_Q = int(os.environ.get("AB_NQ", "10000"))
NLIST = int(os.environ.get("AB_NLIST", "256"))


def arm(nprobe: int) -> dict:
    import numpy as np

    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "48g"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_smoke

    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name=f"np-profile-{nprobe}")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=64)
    emb = emb.select("vec_id", "embedding")
    t0 = time.monotonic()
    idx = build_ivf(emb, "embedding", nlist=NLIST, seed=42)
    idx.assigned.persist().count()
    build_s = round(time.monotonic() - t0, 1)
    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, 64))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()
    walls = []
    for _ in range(2):
        t1 = time.monotonic()
        res = ivf_search_df(
            idx, qdf, k=10, nprobe=nprobe, id_col="vec_id",
            impl="arrow", unique_q_ids=True,
        )
        res.count()
        walls.append(round(time.monotonic() - t1, 1))
        release(res)
    scanned = N_VEC * nprobe / NLIST * N_Q  # scored pairs
    return {
        "nprobe": nprobe, "build_s": build_s, "walls_s": walls,
        "warm_s": min(walls),
        "ns_per_scored_pair": round(min(walls) / scanned * 1e9, 3),
    }


def main():
    if "--arm" in sys.argv:
        nprobe = int(sys.argv[sys.argv.index("--arm") + 1])
        print(json.dumps(arm(nprobe)))
        return
    arms = {}
    for nprobe in (64, 96):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO
        print(f"arm nprobe={nprobe} (fresh JVM) ...", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", str(nprobe)],
            env=env, capture_output=True, text=True, timeout=5400, cwd=REPO,
        )
        line = [l for l in proc.stdout.strip().splitlines()
                if l.strip().startswith("{")]
        if not line:
            raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])
        arms[f"np{nprobe}"] = json.loads(line[-1])
        print(" ", arms[f"np{nprobe}"], flush=True)
    ratio = (arms["np96"]["ns_per_scored_pair"]
             / arms["np64"]["ns_per_scored_pair"])
    rec = {
        "what": "fresh-JVM-per-arm nprobe profile of ivf_search_df at "
                "20M (VERDICT r11 item 6): is np96's per-scanned-row "
                "cost within ~1.6x of np64's once session storage state "
                "is ruled out?",
        "shape": {"n_vec": N_VEC, "nq": N_Q, "nlist": NLIST,
                  "k": 10, "impl": "arrow", "salt": 8},
        "arms": arms,
        "per_row_cost_ratio_np96_over_np64": round(ratio, 2),
        "within_1_6x": ratio <= 1.6,
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(rec, f, indent=2)
    print("wrote", OUT_PATH)
    print(json.dumps({k: rec[k] for k in
                      ("per_row_cost_ratio_np96_over_np64", "within_1_6x")}))


if __name__ == "__main__":
    main()
