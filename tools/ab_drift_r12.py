#!/usr/bin/env python
"""Same-box A/B of HEAD vs the r10 commit (0ef7ec9): re-creates the
lost `ab_ivf_drift_r11.json` evidence (VERDICT r11 What's-wrong #1 —
DESIGN.md's "the +12% bench move is host clock, not code" settlement
cited an artifact that was never committed). Runs `bench.py` in each
tree as a subprocess (each gets its own tree on PYTHONPATH and its own
local[*] JVM, sequentially), records both suites, the per-query
deltas, and a single-thread dgemm clock probe so the reading is
interpretable across sessions with different CPU clocks.

Usage: python tools/ab_drift_r12.py
  (expects the r10 worktree at <repo>/.ab_r10 — `git worktree add
   .ab_r10 0ef7ec9`; override with AB_R10_TREE)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R10_TREE = os.environ.get("AB_R10_TREE", os.path.join(REPO, ".ab_r10"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_PATH = os.path.join(REPO, "spark-warehouse", "ab_ivf_drift_r12.json")


def clock_probe() -> float:
    """Single-thread dgemm GFLOP/s — the same probe the r11 session
    used to show the host pinned at 2100 MHz (60.8 GFLOP/s)."""
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


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    proc = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON line from bench in {tree}:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


def main():
    # probe the clock in THIS process before any JVM contends for cores
    gflops = clock_probe()
    head_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    r10_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=R10_TREE,
        capture_output=True, text=True,
    ).stdout.strip()
    print(f"clock probe: {gflops} GFLOP/s single-thread dgemm")
    print(f"bench HEAD ({head_sha}) ...")
    head = run_bench(REPO)
    print(f"  value {head['value']} s")
    print(f"bench r10 ({r10_sha}) ...")
    r10 = run_bench(R10_TREE)
    print(f"  value {r10['value']} s")
    deltas = {
        q: round(head["queries"][q] - r10["queries"][q], 3)
        for q in head.get("queries", {})
        if q in r10.get("queries", {})
    }
    rec = {
        "what": "same-box A/B of HEAD vs the r10 commit, one bench.py "
                "suite each (sequential, own JVMs); re-creates the lost "
                "ab_ivf_drift_r11.json evidence",
        "sf_dir": SF_DIR,
        "clock_probe_gflops_1t": gflops,
        "head_sha": head_sha,
        "r10_sha": r10_sha,
        "head": head,
        "r10": r10,
        "per_query_delta_head_minus_r10_s": deltas,
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {OUT_PATH}")


if __name__ == "__main__":
    main()
