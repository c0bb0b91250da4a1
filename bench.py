#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measured queries mirror BASELINE.md's plan:
  q_knn        exact knn top-10 (l2sq) over embeddings
  q_hybrid     weighted 2-column hybrid search (union+dedup+re-rank)
  q_bm25_build BM25 postings build over documents
  q_bm25       BM25 top-10 search (prebuilt postings)
  q_pq         PQ codebook train (8x16 on sample) + full-table encode
  q_ivf        IVF build (nlist=16) + 10 ANN queries nprobe=10
  q_minhash    MinHash-LSH near-dup pairs over documents
  q_tpch_q1    relational agg spine over lineitem
  recall_at_10 IVF recall vs exact (quality metric, target >= 0.9)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables


def timed(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lanterndb-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb, docs, li = t["embeddings"], t["documents"], t["lineitem"]
    emb.cache().count(); docs.cache().count(); li.cache().count()

    from lanterndb_spark.operators.bm25 import build_postings, corpus_stats, search_bm25
    from lanterndb_spark.operators.dedup import minhash_lsh_pairs
    from lanterndb_spark.operators.hybrid import weighted_vector_search
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_batch
    from lanterndb_spark.operators.knn import knn
    from lanterndb_spark.operators.pq import quantize, train_codebook
    from lanterndb_spark.operators.autotune import recall_at_k, sample_queries

    qv = [float(x) for x in emb.first()["embedding"]]
    queries: dict[str, float] = {}

    queries["q_knn"] = timed(
        lambda: knn(emb, "embedding", qv, k=10, id_col="vec_id").collect()
    )

    hybrid_df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
    )
    queries["q_hybrid"] = timed(
        lambda: weighted_vector_search(
            hybrid_df, [(1.0, "v1", qv), (0.5, "v2", list(reversed(qv)))],
            ef=100, limit=20,
        ).collect()
    )

    postings_stats = {}

    def build_p():
        p = build_postings(docs).cache()
        p.count()
        postings_stats["p"] = p
        postings_stats["st"] = corpus_stats(docs)

    queries["q_bm25_build"] = timed(build_p)
    queries["q_bm25"] = timed(
        lambda: search_bm25(
            docs, "spark window merge", limit=10,
            postings=postings_stats["p"], stats=postings_stats["st"],
        ).collect()
    )

    def pq_job():
        cb = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
        quantize(emb, "embedding", cb).select(F.sum(F.element_at("embedding_pq", 1))).collect()

    queries["q_pq"] = timed(pq_job)

    ivf_state = {}

    def ivf_job():
        idx = build_ivf(emb, "embedding", nlist=16, seed=42)
        idx.assigned.cache().count()
        ivf_state["idx"] = idx
        qs = sample_queries(emb, "embedding", n=10, seed=7)
        ivf_state["qs"] = qs
        ivf_search_batch(idx, qs, k=10, nprobe=10, id_col="vec_id").collect()

    queries["q_ivf"] = timed(ivf_job)

    queries["q_minhash"] = timed(
        lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        ).count()
    )

    def knn_join_job():
        from lanterndb_spark.operators.knn import knn_join

        qdf = emb.limit(32).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
        )
        knn_join(emb, "embedding", qdf, "qv", k=10, id_col="vec_id").collect()

    queries["q_knn_join"] = timed(knn_join_job)

    def sessionize_job():
        from lanterndb_spark.streaming.sessions import sessionize_batch

        ev = t["events"]
        sessionize_batch(ev, gap="30 minutes").count()

    queries["q_sessionize"] = timed(sessionize_job)

    queries["q_tpch_q1"] = timed(
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.avg("l_quantity"), F.count("*"),
        )
        .collect()
    )

    # quality metric: IVF recall@10 vs exact on 10 sampled queries (batch)
    from lanterndb_spark.operators.autotune import _collect_by_query, exact_topk_batch

    idx, qs = ivf_state["idx"], ivf_state["qs"]
    truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
    got = _collect_by_query(
        ivf_search_batch(idx, qs, k=10, nprobe=10, id_col="vec_id"), "vec_id"
    )
    recs = [recall_at_k(got.get(i, []), truth.get(i, [])) for i in range(len(qs))]
    recall = round(sum(recs) / len(recs), 4)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "recall_at_10": recall,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
