#!/usr/bin/env python
"""Per-JOB wall-clock decomposition of the heavy bench surfaces via the
in-memory AppStatusStore (round 15, guide §1): each surface's measured
rep is bracketed by marker jobs; afterwards jobsList() yields every
job's submit->end wall and the gap since the previous job ended (driver
think-time). Zero measurement overhead — the event-log variant of this
tool inflated walls ~2.4x (eventlog v2 flushing) and was discarded.

Usage: python tools/jobtime_r15.py [surface ...]
Surfaces: hybriddf_256 ivfdf_2k q_minhash q_ivf q_bm25_build q_pq
Writes spark-warehouse/jobtime_r15_<surface>.json, one per surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables

REPS = int(os.environ.get("JOBTIME_REPS", "3"))


def main():
    surfaces = sys.argv[1:] or ["hybriddf_256", "ivfdf_2k"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jobtime-r15")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb, docs = t["embeddings"], t["documents"]
    emb.cache().count(); docs.cache().count()

    from lanterndb_spark.operators.autotune import sample_queries
    from lanterndb_spark.operators.bm25 import build_postings, corpus_stats
    from lanterndb_spark.operators.dedup import minhash_lsh_pairs
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_batch, ivf_search_df
    from lanterndb_spark.operators.pq import quantize, train_codebook
    from lanterndb_spark.plans.shape import release

    idx = build_ivf(emb, "embedding", nlist=16, seed=42)
    idx.assigned.cache().count()
    qs = sample_queries(emb, "embedding", n=10, seed=7)

    state: dict = {}

    def body_hybriddf_256():
        emb2 = emb.select(
            "vec_id", "embedding", F.reverse("embedding").alias("emb_r"))
        qdf_h = state["qdf_h"]
        out_h = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4)
        out_h.count()
        release(out_h)

    def prep_hybriddf_256():
        qdf_h = spark.createDataFrame(
            [(i, q, list(reversed(q))) for i, q in enumerate(
                qs * (256 // len(qs) + 1))][:256],
            "q_id int, qv array<double>, qv_r array<double>").persist()
        qdf_h.count()
        state["qdf_h"] = qdf_h

    def prep_ivfdf_2k():
        qrows = [(i, q) for i, q in enumerate(qs * 200)]
        qdf_b = spark.createDataFrame(
            qrows[:2000], "q_id int, query array<double>").persist()
        qdf_b.count()
        state["qdf_b"] = qdf_b

    def body_ivfdf_2k():
        out = ivf_search_df(idx, state["qdf_b"], k=10, nprobe=10,
                            id_col="vec_id")
        out.count()
        release(out)

    def body_q_minhash():
        out = minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5)
        out.count()
        release(out)

    def body_q_ivf():
        if "idx2" in state:
            state["idx2"].assigned.unpersist()
        idx2 = build_ivf(emb, "embedding", nlist=16, seed=42)
        idx2.assigned.cache().count()
        state["idx2"] = idx2
        qs2 = sample_queries(emb, "embedding", n=10, seed=7)
        ivf_search_batch(idx2, qs2, k=10, nprobe=10, id_col="vec_id").collect()

    def body_q_bm25_build():
        if "p" in state:
            state["p"].unpersist()
        p = build_postings(docs).cache()
        p.count()
        state["p"] = p
        corpus_stats(docs)

    def body_q_pq():
        cb = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
        quantize(emb, "embedding", cb).select(
            F.sum(F.element_at("embedding_pq", 1))).collect()

    bodies = {
        "hybriddf_256": (prep_hybriddf_256, body_hybriddf_256),
        "ivfdf_2k": (prep_ivfdf_2k, body_ivfdf_2k),
        "q_minhash": (None, body_q_minhash),
        "q_ivf": (None, body_q_ivf),
        "q_bm25_build": (None, body_q_bm25_build),
        "q_pq": (None, body_q_pq),
    }

    def mark(label):
        sc.setJobDescription(label)
        sc.parallelize([0], 1).count()
        sc.setJobDescription(None)

    walls: dict[str, list] = {}
    for s in surfaces:
        prep, body = bodies[s]
        if prep:
            prep()
        body()  # warm
        walls[s] = []
        for rep in range(REPS):
            mark(f"MARK-{s}-r{rep}-begin")
            sc.setJobDescription(f"BODY-{s}-r{rep}")
            t0 = time.monotonic()
            body()
            walls[s].append(round(time.monotonic() - t0, 3))
            sc.setJobDescription(None)
            mark(f"MARK-{s}-r{rep}-end")
        print(f"{s}: walls {walls[s]}", flush=True)

    # ---- read job timeline from the status store
    store = sc._jsc.sc().statusStore()
    jl = store.jobsList(None)
    jobs = {}
    for i in range(jl.size()):
        j = jl.apply(i)
        st, ct = j.submissionTime(), j.completionTime()
        jobs[j.jobId()] = {
            "desc": j.description().get() if j.description().isDefined() else "",
            "name": j.name(),
            "t0": st.get().getTime() if st.isDefined() else None,
            "t1": ct.get().getTime() if ct.isDefined() else None,
            "nstages": j.stageIds().size(),
        }
    spark.stop()

    jids = sorted(jobs)
    for s in surfaces:
        doc = {"surface": s, "rep_walls_s": walls.get(s), "reps": []}
        for rep in range(REPS):
            try:
                lo = next(j for j in jids
                          if jobs[j]["desc"] == f"MARK-{s}-r{rep}-begin")
                hi = next(j for j in jids
                          if jobs[j]["desc"] == f"MARK-{s}-r{rep}-end")
            except StopIteration:
                continue
            rows = []
            prev_end = None
            for j in jids:
                if not (lo < j < hi):
                    continue
                info = jobs[j]
                if info["t0"] is None or info["t1"] is None:
                    continue
                wall = (info["t1"] - info["t0"]) / 1e3
                gap = None if prev_end is None else round(
                    (info["t0"] - prev_end) / 1e3, 3)
                prev_end = max(prev_end or 0, info["t1"])
                rows.append({
                    "job": j, "wall_s": round(wall, 3), "gap_s": gap,
                    "nstages": info["nstages"],
                    "name": info["name"][:100]})
            doc["reps"].append(rows)
        out = os.path.join(ROOT, "spark-warehouse", f"jobtime_r15_{s}.json")
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"== {s} walls {walls.get(s)}")
        if doc["reps"]:
            for r in doc["reps"][-1]:
                print(f"  job {r['job']:4d} wall {r['wall_s']:7.3f} gap "
                      f"{str(r['gap_s']):>7s} stages {r['nstages']:2d}  {r['name']}")


if __name__ == "__main__":
    main()
