"""Single-graph HNSW insert-rate record (VERDICT r6 item 3 / r8 item 7).

Pins the per-insert cost of the lockstep insert core at the canonical
configuration (12k rows, dim 64, m=16, efc=128, iid gaussian) against
the <=0.68 ms/insert bar, plus recall@10 at ef=64 vs brute force.
Single-threaded BLAS (set before numpy import) so the number measures
the kernel, not OpenBLAS oversubscription — same methodology as the
round-7 readings (DESIGN.md round-7 work record).

Run: python tools/insert_bench.py [reps]
Writes spark-warehouse/insert_bench_r9.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lanterndb_spark.operators.hnsw import _Graph  # noqa: E402


def one_run(n=12_000, d=64, m=16, efc=128, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d)
    t0 = time.monotonic()
    g = _Graph(np.arange(n), X, m=m, efc=efc, seed=seed)
    dt = time.monotonic() - t0
    return g, X, dt * 1000.0 / n


def recall_at_10(g, X, n_queries=50, ef=64, seed=1):
    rng = np.random.RandomState(seed)
    qidx = rng.choice(len(X), n_queries, replace=False)
    hits = 0
    for qi in qidx:
        q = X[qi]
        ids, _ = g.search(q, 10, ef)
        exact = np.argsort(((X - q[None, :]) ** 2).sum(1))[:10]
        hits += len(set(int(i) for i in ids[:10]) & set(int(i) for i in exact))
    return hits / (10 * n_queries)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    la1 = os.getloadavg()[0]
    times = []
    g = X = None
    for r in range(reps):
        g, X, ms = one_run(seed=r)
        times.append(round(ms, 4))
    rec = recall_at_10(g, X)
    times_sorted = sorted(times)
    out = {
        "config": {"n": 12_000, "dim": 64, "m": 16, "efc": 128,
                   "blas_threads": 1},
        "ms_per_insert": {"best": times_sorted[0],
                          "median": times_sorted[len(times) // 2],
                          "all": times},
        "recall_at_10_ef64": round(rec, 4),
        "bar_ms": 0.68,
        "bar_met_best": times_sorted[0] <= 0.68,
        "bar_met_median": times_sorted[len(times) // 2] <= 0.68,
        "loadavg_at_start": round(la1, 2),
    }
    os.makedirs("spark-warehouse", exist_ok=True)
    with open("spark-warehouse/insert_bench_r9.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
