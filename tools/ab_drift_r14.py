#!/usr/bin/env python
"""Settle the r13 bench regression (VERDICT r13, Next round #1).

BENCH_r13 read 12.63 s warm (+9.1% vs r12) with the batch block +23-33%
(ivfdf_2k 2.347->3.132, bm25df_64 1.847->2.263, hybriddf_256
2.799->3.500) on a quieter box than r12. The r13 diff restructured
`ivf_search_df` (deferred column selection + base_decode hook,
ivf.py:555-612) — directly under ivfdf_2k — but bm25df/hybriddf code is
untouched, which smells like clock/session drift. This tool applies the
project's own A/B discipline to decide: interleaved fresh JVMs
(A,B,A,B...), one tree per arm via PYTHONPATH (HEAD vs the r12 snapshot
worktree `.ab_r12` at a235981), an in-arm single-thread dgemm clock
probe per JVM, JSON re-written after every arm so a timeout leaves a
truthful partial artifact.

Targets: the three worst suite rows (q_ivf, q_minhash, q_decontam) and
the three batch-block rows, each defined EXACTLY as bench.py defines
them (same knobs, same state reuse) so the walls are comparable to the
driver record.

Usage: python tools/ab_drift_r14.py             # wrapper, 3 JVM pairs
       python tools/ab_drift_r14.py --arm TREE  # one JVM over TREE
Knobs: AB_PAIRS (default 3), AB_WARM (default 2 warm reps per query
per JVM; rep 0 is recorded separately as cold).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R12_TREE = os.environ.get("AB_R12_TREE", os.path.join(REPO, ".ab_r12"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_PATH = os.path.join(REPO, "spark-warehouse", "ab_drift_r14.json")
PAIRS = int(os.environ.get("AB_PAIRS", "3"))
WARM = int(os.environ.get("AB_WARM", "2"))


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


def arm() -> dict:
    """One fresh JVM: set up exactly like bench.py, run the six target
    queries WARM times after one cold rep each.  Which tree's code runs
    is decided by PYTHONPATH (set by the wrapper)."""
    from pyspark.sql import functions as F

    from lanterndb_spark.operators.autotune import sample_queries
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25_df,
    )
    from lanterndb_spark.operators.contamination import decontaminate
    from lanterndb_spark.operators.dedup import minhash_lsh_pairs
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import (
        build_ivf, ivf_search_batch, ivf_search_df,
    )
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark, load_tables

    probe0 = clock_probe()
    spark = get_spark(app_name="ab-drift-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    emb, docs = t["embeddings"], t["documents"]
    emb.cache().count()
    docs.cache().count()

    state: dict = {}
    p = build_postings(docs).cache()
    p.count()
    st = corpus_stats(docs)
    qs = sample_queries(emb, "embedding", n=10, seed=7)

    def q_ivf():
        if "idx" in state:
            state["idx"].assigned.unpersist()
        idx = build_ivf(emb, "embedding", nlist=16, seed=42)
        idx.assigned.cache().count()
        state["idx"] = idx
        ivf_search_batch(idx, qs, k=10, nprobe=10, id_col="vec_id").collect()

    def q_minhash():
        out = minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        )
        out.count()
        release(out)

    def q_decontam():
        bench = docs.filter(F.col("doc_id") % 19 == 0)
        corpus = docs.filter(F.col("doc_id") % 19 != 0)
        decontaminate(corpus, bench, n=5).filter("contaminated").count()

    qdf_b = spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs * 200)][:2000],
        "q_id int, query array<double>",
    ).persist()
    qdf_b.count()

    def ivfdf_2k():
        ivf_search_df(
            state["idx"], qdf_b, k=10, nprobe=10, id_col="vec_id"
        ).count()

    qtexts = [
        "spark window merge", "broadcast join plan",
        "stream state checkpoint", "partition data table",
        "query engine index", "shuffle spill memory",
        "columnar scan filter", "hash aggregate group",
    ]
    qdf_t = spark.createDataFrame(
        [(i, qtexts[i % len(qtexts)]) for i in range(64)],
        "q_id int, query string",
    )

    def bm25df_64():
        search_bm25_df(docs, qdf_t, limit=10, postings=p, stats=st).count()

    emb2 = emb.select(
        "vec_id", "embedding", F.reverse("embedding").alias("emb_r")
    )
    qdf_h = spark.createDataFrame(
        [(i, q, list(reversed(q)))
         for i, q in enumerate((qs * 26))][:256],
        "q_id int, qv array<double>, qv_r array<double>",
    ).persist()
    qdf_h.count()

    def hybriddf_256():
        out_h = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": state["idx"]}, nprobe=4,
        )
        out_h.count()
        release(out_h)

    # q_ivf must run before the batch rows (they reuse state["idx"],
    # exactly as bench.py orders it)
    targets = [
        ("q_ivf", q_ivf), ("q_minhash", q_minhash),
        ("q_decontam", q_decontam), ("ivfdf_2k", ivfdf_2k),
        ("bm25df_64", bm25df_64), ("hybriddf_256", hybriddf_256),
    ]
    cold, warm = {}, {name: [] for name, _ in targets}
    for rep in range(WARM + 1):
        for name, fn in targets:
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 3)
            if rep == 0:
                cold[name] = dt
            else:
                warm[name].append(dt)
    probe1 = clock_probe()
    spark.stop()
    med = {n: sorted(v)[len(v) // 2] for n, v in warm.items()}
    return {
        "probe_gflops_pre": probe0, "probe_gflops_post": probe1,
        "cold": cold, "warm": warm, "warm_median": med,
    }


def main():
    if "--arm" in sys.argv:
        print(json.dumps(arm()))
        return

    def sha(tree):
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=tree,
            capture_output=True, text=True,
        ).stdout.strip()

    rec = {
        "what": "interleaved fresh-JVM clock-probed A/B of HEAD vs the "
                "r12 snapshot on the 6 queries BENCH_r13 flagged "
                "(+9% suite / +23-33% batch block); arm definitions "
                "mirror bench.py exactly",
        "sf_dir": SF_DIR,
        "head_sha": sha(REPO), "r12_sha": sha(R12_TREE),
        "pairs": [],
    }

    def run_arm(tree: str) -> dict:
        env = dict(os.environ)
        env["PYTHONPATH"] = tree
        env["SPARK_GRAFT_SF_DIR"] = SF_DIR
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", tree],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(
            f"arm over {tree} produced no JSON:\n{proc.stdout[-2000:]}\n"
            f"{proc.stderr[-2000:]}"
        )

    for i in range(PAIRS):
        # alternate which arm goes first inside each pair so a slow
        # monotonic clock drift cancels instead of biasing one arm
        order = (
            [("head", REPO), ("r12", R12_TREE)] if i % 2 == 0
            else [("r12", R12_TREE), ("head", REPO)]
        )
        pair = {}
        for label, tree in order:
            print(f"pair {i} arm {label} ...", flush=True)
            pair[label] = run_arm(tree)
            print(f"  medians {pair[label]['warm_median']} "
                  f"probe {pair[label]['probe_gflops_pre']}/"
                  f"{pair[label]['probe_gflops_post']}", flush=True)
        rec["pairs"].append(pair)
        # paired ratios so far (head/r12 per query, median across pairs)
        qnames = list(rec["pairs"][0]["head"]["warm_median"])
        ratios = {
            q: sorted(
                p["head"]["warm_median"][q] / p["r12"]["warm_median"][q]
                for p in rec["pairs"]
            )[len(rec["pairs"]) // 2]
            for q in qnames
        }
        rec["paired_ratio_head_over_r12_median"] = {
            q: round(v, 3) for q, v in ratios.items()
        }
        os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
        with open(OUT_PATH, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"wrote {OUT_PATH} after pair {i}", flush=True)
    print(json.dumps(rec["paired_ratio_head_over_r12_median"], indent=2))


if __name__ == "__main__":
    main()
