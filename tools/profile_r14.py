#!/usr/bin/env python
"""Round-14 §1 measurement: per-job decomposition of the bench's heavy
queries (q_minhash, q_ivf, q_pq, q_bm25_build, ivfdf_2k, bm25df_64,
hybriddf_256) so optimization targets the measured hot stage, not a
guess. Writes spark-warehouse/profile_r14.json.

Each phase is warmed once and timed over N reps (median), mirroring
bench.py's methodology. Sub-phases re-run the operator's own internal
steps (imported privates) so the decomposition sums to the query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables

REPS = int(os.environ.get("PROFILE_REPS", "3"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "spark-warehouse", "profile_r14.json")

record: dict = {"reps": REPS, "phases": {}}


def ptime(name: str, fn, reps: int = REPS):
    fn()  # warm
    samples = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        samples.append(round(time.monotonic() - t0, 4))
    med = round(statistics.median(samples), 4)
    record["phases"][name] = {"median_s": med, "samples": samples}
    print(f"{name}: {med}s {samples}", flush=True)
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb, docs = t["embeddings"], t["documents"]
    emb.cache().count(); docs.cache().count()

    from lanterndb_spark.operators.autotune import sample_queries
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25_df,
    )
    from lanterndb_spark.operators.dedup import (
        _minhash_wide, minhash_lsh_pairs, shingle_table,
    )
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_batch, ivf_search_df
    from lanterndb_spark.operators.knn import knn_join
    from lanterndb_spark.operators.pq import quantize, train_codebook
    from lanterndb_spark.plans.shape import bounded_rand_sample, release

    # ---------------- q_minhash decomposition
    def mh_signatures():
        w = _minhash_wide(docs, "doc_id", "text", 64, 3)
        w.count()

    ptime("minhash.signature_agg", mh_signatures)

    def mh_full():
        out = minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5)
        out.count()
        release(out)

    ptime("minhash.full", mh_full)

    # candidate-only (no verify): signatures + banding + hot check + self-join
    def mh_cand():
        out = minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5,
            verify=False)
        out.count()
        release(out)

    ptime("minhash.candidates_only", mh_cand)

    def mh_shingle():
        shingle_table(docs, "doc_id", "text", 3).select(
            F.sum(F.size("sh"))).collect()

    ptime("minhash.shingle_pass", mh_shingle)

    # hot-bucket check disabled (max_bucket=None): how much does the
    # hot-key guard job cost?
    def mh_nocap():
        out = minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5,
            max_bucket=None)
        out.count()
        release(out)

    ptime("minhash.no_hotcap", mh_nocap)

    # ---------------- q_ivf decomposition
    def ivf_sample():
        bounded_rand_sample(emb.select(F.col("embedding").alias("v")), 50_000, 42)

    ptime("ivf.bounded_rand_sample", ivf_sample)

    def ivf_build_assign():
        idx = build_ivf(emb, "embedding", nlist=16, seed=42)
        idx.assigned.cache().count()
        idx.assigned.unpersist()

    ptime("ivf.build_and_assign", ivf_build_assign)

    idx = build_ivf(emb, "embedding", nlist=16, seed=42)
    idx.assigned.cache().count()

    ptime("ivf.sample_queries", lambda: sample_queries(emb, "embedding", n=10, seed=7))
    qs = sample_queries(emb, "embedding", n=10, seed=7)

    ptime("ivf.search_batch10", lambda: ivf_search_batch(
        idx, qs, k=10, nprobe=10, id_col="vec_id").collect())

    # ---------------- q_pq decomposition
    ptime("pq.train_codebook", lambda: train_codebook(
        emb, "embedding", splits=8, clusters=16, seed=42))
    cb = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
    ptime("pq.quantize_sum", lambda: quantize(emb, "embedding", cb).select(
        F.sum(F.element_at("embedding_pq", 1))).collect())

    # ---------------- q_bm25_build decomposition
    def bm_postings():
        p = build_postings(docs).cache()
        p.count()
        p.unpersist()

    ptime("bm25.build_postings", bm_postings)
    ptime("bm25.corpus_stats", lambda: corpus_stats(docs))

    p = build_postings(docs).cache(); p.count()
    st = corpus_stats(docs)

    # ---------------- batch block
    nq_b = 2000
    qrows = [(i, q) for i, q in enumerate(qs * (nq_b // 10))]
    qdf_b = spark.createDataFrame(qrows[:nq_b], "q_id int, query array<double>").persist()
    qdf_b.count()

    from lanterndb_spark.operators.hnsw import _has_duplicate_qids

    ptime("ivfdf.dup_check", lambda: _has_duplicate_qids(qdf_b, "q_id"))

    def ivfdf(salt=8, impl="auto", prune=True, unique=False):
        def run():
            out = ivf_search_df(idx, qdf_b, k=10, nprobe=10, id_col="vec_id",
                                salt=salt, impl=impl, prune=prune,
                                unique_q_ids=unique)
            out.count()
            release(out)
        return run

    ptime("ivfdf.full_salt8", ivfdf())
    ptime("ivfdf.salt1", ivfdf(salt=1))
    ptime("ivfdf.salt2", ivfdf(salt=2))
    ptime("ivfdf.salt8_unique", ivfdf(unique=True))
    ptime("ivfdf.salt1_unique_noprune", ivfdf(salt=1, prune=False, unique=True))
    ptime("ivfdf.expr", ivfdf(impl="expr"))

    # ---------------- bm25df_64
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

    def bm25df(prune=8192, unique=False):
        def run():
            search_bm25_df(docs, qdf_t, limit=10, postings=p, stats=st,
                           prune_terms=prune, unique_q_ids=unique).count()
        return run

    ptime("bm25df.full", bm25df())
    ptime("bm25df.unique", bm25df(unique=True))
    ptime("bm25df.noprune", bm25df(prune=None))
    ptime("bm25df.noprune_unique", bm25df(prune=None, unique=True))

    # ---------------- hybriddf_256
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    emb2 = emb.select("vec_id", "embedding", F.reverse("embedding").alias("emb_r"))
    qdf_h = spark.createDataFrame(
        [(i, q, list(reversed(q))) for i, q in enumerate(qs * (256 // 10 + 1))][:256],
        "q_id int, qv array<double>, qv_r array<double>",
    ).persist()
    qdf_h.count()

    def hybriddf():
        out = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4,
        )
        out.count()
        release(out)

    ptime("hybriddf.full", hybriddf)

    # the two candidate stages in isolation
    def hyb_ivf_stage():
        out = ivf_search_df(
            idx, qdf_h.select("q_id", "qv"), k=20, nprobe=4, id_col="vec_id",
            q_vec_col="qv", unique_q_ids=True)
        out.count()
        release(out)

    ptime("hybriddf.ivf_stage", hyb_ivf_stage)

    def hyb_knn_stage():
        knn_join(
            emb2.select("vec_id", "emb_r"), "emb_r",
            qdf_h.select("q_id", "qv_r"), "qv_r",
            k=20, id_col="vec_id", unique_q_ids=True).count()

    ptime("hybriddf.knn_stage", hyb_knn_stage)

    record["conditions"] = {"load_1m": round(os.getloadavg()[0], 2),
                            "cpus": os.cpu_count()}
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
