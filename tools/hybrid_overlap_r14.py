#!/usr/bin/env python
"""Round-14 guide §1 measurement for the hybriddf_256 bench surface:
how much of the batch hybrid call is SEQUENTIAL eager driver work
(per-term candidate-stage construction: ivf's routed persist+rollup,
knn_join's capped collect) vs the final combined job.

Modes (argv[1]):
  decompose  — time dup-check, each stage's construction (the lazy
               DataFrame build INCLUDING its internal eager jobs), the
               whole weighted_vector_search_df call, and the final
               count, on the bench's exact shapes (256 queries, ef=20,
               nlist=16 ivf index on sf0.1).
  ab         — interleaved paired A/B of the full surface with
               hybrid._STAGE_THREADS toggled (sequential vs overlapped
               construction), fresh pairs, paired deltas + median.

Writes spark-warehouse/hybrid_overlap_r14.json (merging modes).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "spark-warehouse", "hybrid_overlap_r14.json")
REPS = int(os.environ.get("PROFILE_REPS", "3"))


def setup():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hybrid-overlap-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    emb.cache().count()

    from lanterndb_spark.operators.autotune import sample_queries
    from lanterndb_spark.operators.ivf import build_ivf

    idx = build_ivf(emb, "embedding", nlist=16, seed=42)
    qs = sample_queries(emb, "embedding", n=10, seed=7)
    emb2 = emb.select("vec_id", "embedding",
                      F.reverse("embedding").alias("emb_r"))
    qdf_h = spark.createDataFrame(
        [(i, q, list(reversed(q))) for i, q in enumerate(
            qs * (256 // 10 + 1))][:256],
        "q_id int, qv array<double>, qv_r array<double>",
    ).persist()
    qdf_h.count()
    return spark, idx, emb2, qdf_h


def load_record():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {}


def save_record(rec):
    rec["conditions"] = {"load_1m": round(os.getloadavg()[0], 2),
                         "cpus": os.cpu_count()}
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", OUT)


def decompose():
    spark, idx, emb2, qdf_h = setup()
    from lanterndb_spark.operators.hnsw import _has_duplicate_qids
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import ivf_search_df
    from lanterndb_spark.operators.knn import knn_join
    from lanterndb_spark.plans.shape import release

    rec = load_record()
    phases = rec.setdefault("decompose", {})

    def ptime(name, fn, reps=REPS):
        fn()  # warm
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            samples.append(round(time.monotonic() - t0, 4))
        med = round(statistics.median(samples), 4)
        phases[name] = {"median_s": med, "samples": samples}
        print(f"{name}: {med}s {samples}", flush=True)

    ptime("dup_check", lambda: _has_duplicate_qids(qdf_h, "q_id"))

    def ivf_construct():
        out = ivf_search_df(
            idx, qdf_h.select("q_id", "qv"), k=20, nprobe=4, id_col="vec_id",
            q_vec_col="qv", unique_q_ids=True)
        release(out)

    ptime("ivf_stage_construct", ivf_construct)

    ptime("knn_stage_construct", lambda: knn_join(
        emb2.select("vec_id", "emb_r"), "emb_r",
        qdf_h.select("q_id", "qv_r"), "qv_r",
        k=20, id_col="vec_id", unique_q_ids=True))

    held = {}

    def full_construct():
        if "out" in held:
            release(held.pop("out"))
        held["out"] = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4)

    ptime("full_construct", full_construct)
    ptime("final_count", lambda: held["out"].count())

    def full():
        out = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4)
        out.count()
        release(out)

    ptime("full", full)
    save_record(rec)
    spark.stop()


def ab(pairs=6):
    spark, idx, emb2, qdf_h = setup()
    from lanterndb_spark.operators import hybrid
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.plans.shape import release

    if not hasattr(hybrid, "_STAGE_THREADS"):
        raise SystemExit("hybrid._STAGE_THREADS not present — run after the change")

    def run():
        out = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4)
        rows = sorted(
            (r["q_id"], r["vec_id"], round(r["joint_dist"], 9))
            for r in out.collect())
        release(out)
        return rows

    def construct():
        return weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4)

    saved = hybrid._STAGE_THREADS
    hybrid._STAGE_THREADS = 0
    base_rows = run()  # warm seq
    hybrid._STAGE_THREADS = 8
    thr_rows = run()   # warm thr
    assert base_rows == thr_rows, "rows differ between arms!"

    # The change affects ONLY the construction phase (eager driver
    # jobs); the final combined job is plan-identical across arms and
    # its variance on this box swamps whole-surface deltas — so time
    # construction per arm, then materialize+release untimed.
    deltas, arms = [], {"seq": [], "thr": []}
    full_deltas, full_arms = [], {"seq": [], "thr": []}
    for i in range(pairs):
        order = [("seq", 0), ("thr", 8)] if i % 2 == 0 else [("thr", 8), ("seq", 0)]
        pair, fpair = {}, {}
        for name, val in order:
            hybrid._STAGE_THREADS = val
            t0 = time.monotonic()
            out = construct()
            pair[name] = round(time.monotonic() - t0, 4)
            out.count()
            fpair[name] = round(time.monotonic() - t0, 4)
            release(out)
            arms[name].append(pair[name])
            full_arms[name].append(fpair[name])
        deltas.append(round(pair["seq"] - pair["thr"], 4))
        full_deltas.append(round(fpair["seq"] - fpair["thr"], 4))
        print(f"pair {i}: construct seq={pair['seq']} thr={pair['thr']} "
              f"delta={deltas[-1]} | full delta={full_deltas[-1]}",
              flush=True)
    hybrid._STAGE_THREADS = saved

    rec = load_record()
    rec["ab"] = {
        "pairs": pairs,
        "construct_deltas": deltas,
        "construct_median_delta_s": round(statistics.median(deltas), 4),
        "construct_seq": arms["seq"], "construct_thr": arms["thr"],
        "construct_seq_median": round(statistics.median(arms["seq"]), 4),
        "construct_thr_median": round(statistics.median(arms["thr"]), 4),
        "full_deltas": full_deltas,
        "full_median_delta_s": round(statistics.median(full_deltas), 4),
        "rows_identical": True,
    }
    print(json.dumps(rec["ab"], indent=1))
    save_record(rec)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "decompose"
    if mode == "decompose":
        decompose()
    elif mode == "ab":
        ab(int(sys.argv[2]) if len(sys.argv) > 2 else 6)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
