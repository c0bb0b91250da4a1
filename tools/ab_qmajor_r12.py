#!/usr/bin/env python
"""Kernel A/B of the r11 QUERY-MAJOR ivf_search_df arrow kernel (HEAD)
vs the r10 ROW-MAJOR kernel, same data / same knobs — re-creates the
lost `ab_qmajor_r11.json` evidence behind the kernel rewrite
(VERDICT r11 What's-wrong #1: ivf.py cites "49x the dgemm floor, 420
of 455 core-s at 2M/20k-q" from an artifact that was never committed).
The r10 kernel no longer exists at HEAD, so it runs from the r10
worktree (PYTHONPATH per subprocess, own JVM each, sequential).

Also records the dgemm floor for the scored pair count at this shape
(multi-thread, measured in-process) so the kernel-vs-floor multiple is
reproducible at any tier.

Usage: python tools/ab_qmajor_r12.py            # wrapper: runs both trees
       python tools/ab_qmajor_r12.py --measure  # inner: one tree's timing
Knobs: AB_NVEC (default 1,000,000), AB_NQ (20,000), AB_DIM (64),
AB_NLIST (64), AB_NPROBE (8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10_TREE = os.environ.get("AB_R10_TREE", os.path.join(REPO, ".ab_r10"))
OUT_PATH = os.path.join(REPO, "spark-warehouse", "ab_qmajor_r12.json")

N_VEC = int(os.environ.get("AB_NVEC", "1000000"))
N_Q = int(os.environ.get("AB_NQ", "20000"))
DIM = int(os.environ.get("AB_DIM", "64"))
NLIST = int(os.environ.get("AB_NLIST", "64"))
NPROBE = int(os.environ.get("AB_NPROBE", "8"))


def measure() -> dict:
    """One tree's timing: synth data, build_ivf, time the arrow batch.
    Deterministic (fixed seeds) so both trees score identical work."""
    import numpy as np

    # the SAME parquet corpus the other scale artifacts use (synthetic
    # RDD-backed frames break build_ivf's sampling collect past the 1 GB
    # driver result cap — per-partition over-fetch before the limit)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "48g"))
    tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(tree, "tools"))
    import scale_smoke

    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df
    from lanterndb_spark.session import get_spark

    spark = get_spark(app_name="ab_qmajor")
    spark.sparkContext.setLogLevel("ERROR")
    df, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=DIM)
    df = df.select("vec_id", "embedding")
    idx = build_ivf(df, "embedding", nlist=NLIST, seed=42)
    idx.assigned.persist().count()

    qrng = np.random.default_rng(777)
    qm = qrng.standard_normal((N_Q, DIM)).astype(np.float64)
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    # ids are minted unique above: skip the r12 duplicate-detection job
    # where the tree supports the flag, so the HEAD arm's wall doesn't
    # carry a Spark job the r10 kernel predates (review finding — the
    # job is ~0.1 s on a cached 20k frame, but an A/B should be clean)
    import inspect

    kw = (
        {"unique_q_ids": True}
        if "unique_q_ids" in inspect.signature(ivf_search_df).parameters
        else {}
    )
    walls = []
    for _ in range(2):  # cold-ish + warm; report both
        t0 = time.monotonic()
        out = ivf_search_df(
            idx, qdf, k=10, nprobe=NPROBE, id_col="vec_id",
            impl="arrow", salt=8, **kw,
        )
        n = out.count()
        walls.append(round(time.monotonic() - t0, 2))
    return {"walls_s": walls, "rows_out": n,
            "cores": os.cpu_count()}


def dgemm_floor() -> dict:
    """Multi-thread dgemm GFLOP/s + the floor seconds for this shape's
    scored-pair flops (pairs x dim x 2, the distance matmul's work)."""
    import numpy as np

    n = 2048
    a = np.random.default_rng(0).standard_normal((n, n))
    b = np.random.default_rng(1).standard_normal((n, n))
    a @ b
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        a @ b
    gflops = 2.0 * n**3 * reps / (time.perf_counter() - t0) / 1e9
    pairs = N_Q * N_VEC * (NPROBE / NLIST)
    flops = pairs * DIM * 2
    return {
        "dgemm_gflops_mt": round(gflops, 1),
        "scored_pairs": int(pairs),
        "floor_s": round(flops / (gflops * 1e9), 2),
    }


def run_tree(tree: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--measure"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from measure in {tree}:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


def main():
    if "--measure" in sys.argv:
        print(json.dumps(measure()))
        return
    floor = dgemm_floor()
    print(f"dgemm floor: {floor}")
    print("HEAD (query-major kernel) ...")
    head = run_tree(REPO)
    print(f"  {head}")
    print("r10 (row-major kernel) ...")
    r10 = run_tree(R10_TREE)
    print(f"  {r10}")
    rec = {
        "what": "ivf_search_df arrow-kernel A/B, HEAD query-major vs r10 "
                "row-major, identical synthetic data/knobs; re-creates the "
                "lost ab_qmajor_r11.json evidence",
        "shape": {"n_vec": N_VEC, "n_q": N_Q, "dim": DIM,
                  "nlist": NLIST, "nprobe": NPROBE, "k": 10, "salt": 8},
        "floor": floor,
        "head_query_major": head,
        "r10_row_major": r10,
        "warm_speedup": round(
            min(r10["walls_s"]) / min(head["walls_s"]), 2
        ),
        "head_warm_x_floor": round(min(head["walls_s"]) / floor["floor_s"], 1),
        "r10_warm_x_floor": round(min(r10["walls_s"]) / floor["floor_s"], 1),
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
