#!/usr/bin/env python
"""Count Spark JOBS per bench query — noise-free structural evidence for
the r14 job-fusion work (job ids are sequential; a no-op marker job
before/after each query body brackets its count). Mirrors bench.py's
query bodies. Usage: python tools/jobcount_r14.py [repo_root]
Prints one JSON line {query: n_jobs, ...}.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jobcount-r14")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb, docs = t["embeddings"], t["documents"]
    emb.cache().count(); docs.cache().count()

    from lanterndb_spark.operators.autotune import sample_queries
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25_df,
    )
    from lanterndb_spark.operators.dedup import minhash_lsh_pairs
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_batch, ivf_search_df
    from lanterndb_spark.operators.knn import knn_join
    from lanterndb_spark.plans.shape import release

    def marker() -> int:
        return sc.parallelize([0], 1).map(lambda x: x).collect() and \
            sc.statusTracker().getJobIdsForGroup()[-0:] and _last_job_id()

    def _last_job_id() -> int:
        ids = sc.statusTracker().getJobIdsForGroup()
        return max(ids) if ids else -1

    def count_jobs(fn) -> int:
        sc.parallelize([0], 1).count()
        before = _last_job_id()
        fn()
        sc.parallelize([0], 1).count()
        after = _last_job_id()
        return after - before - 1

    out = {}
    idx = build_ivf(emb, "embedding", nlist=16, seed=42)
    idx.assigned.cache().count()
    qs = sample_queries(emb, "embedding", n=10, seed=7)
    p = build_postings(docs).cache(); p.count()
    st = corpus_stats(docs)

    def q_ivf():
        idx2 = build_ivf(emb, "embedding", nlist=16, seed=42)
        idx2.assigned.cache().count()
        qs2 = sample_queries(emb, "embedding", n=10, seed=7)
        ivf_search_batch(idx2, qs2, k=10, nprobe=10, id_col="vec_id").collect()
        idx2.assigned.unpersist()

    out["q_ivf"] = count_jobs(q_ivf)

    def q_minhash():
        o = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64,
                              bands=16, threshold=0.5)
        o.count(); release(o)

    out["q_minhash"] = count_jobs(q_minhash)

    def q_knn_join():
        qdf = emb.limit(32).select(F.col("vec_id").alias("q_id"),
                                   F.col("embedding").alias("qv"))
        knn_join(emb, "embedding", qdf, "qv", k=10, id_col="vec_id").collect()

    out["q_knn_join"] = count_jobs(q_knn_join)

    def q_bm25_build():
        p2 = build_postings(docs).cache(); p2.count()
        corpus_stats(docs)
        p2.unpersist()

    out["q_bm25_build"] = count_jobs(q_bm25_build)

    qdf_b = spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs * 200)][:2000],
        "q_id int, query array<double>").persist()
    qdf_b.count()

    def ivfdf():
        o = ivf_search_df(idx, qdf_b, k=10, nprobe=10, id_col="vec_id")
        o.count(); release(o)

    out["ivfdf_2k"] = count_jobs(ivfdf)

    qtexts = ["spark window merge", "broadcast join plan",
              "stream state checkpoint", "partition data table",
              "query engine index", "shuffle spill memory",
              "columnar scan filter", "hash aggregate group"]
    qdf_t = spark.createDataFrame(
        [(i, qtexts[i % 8]) for i in range(64)], "q_id int, query string")

    def bm25df():
        search_bm25_df(docs, qdf_t, limit=10, postings=p, stats=st).count()

    out["bm25df_64"] = count_jobs(bm25df)

    emb2 = emb.select("vec_id", "embedding", F.reverse("embedding").alias("emb_r"))
    qdf_h = spark.createDataFrame(
        [(i, q, list(reversed(q))) for i, q in enumerate(qs * 26)][:256],
        "q_id int, qv array<double>, qv_r array<double>").persist()
    qdf_h.count()

    def hybdf():
        o = weighted_vector_search_df(
            emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
            qdf_h, id_col="vec_id", ef=20, limit=10,
            indexes={"embedding": idx}, nprobe=4)
        o.count(); release(o)

    out["hybriddf_256"] = count_jobs(hybdf)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
