#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query (round 14 §1
measure-first pass). Writes plans/r15/<name>_<tag>.txt for each query,
mirroring bench.py's query bodies exactly; builds (ivf/postings) run
for real so the search plans reflect the real cached inputs.

Usage: python tools/plans_r15.py [tag]    (tag defaults to "before")
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")
os.makedirs(OUT, exist_ok=True)


def cap(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"captured {name}")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb, docs, li = t["embeddings"], t["documents"], t["lineitem"]
    emb.cache().count(); docs.cache().count(); li.cache().count()

    from lanterndb_spark.operators.autotune import sample_queries
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25, search_bm25_df,
    )
    from lanterndb_spark.operators.dedup import minhash_lsh_pairs
    from lanterndb_spark.operators.hybrid import (
        weighted_vector_search, weighted_vector_search_df,
    )
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_batch, ivf_search_df
    from lanterndb_spark.operators.knn import knn, knn_join
    from lanterndb_spark.operators.pq import quantize, train_codebook

    qv = [float(x) for x in emb.first()["embedding"]]

    cap("q_knn", knn(emb, "embedding", qv, k=10, id_col="vec_id"))

    hybrid_df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
    )
    cap("q_hybrid", weighted_vector_search(
        hybrid_df, [(1.0, "v1", qv), (0.5, "v2", list(reversed(qv)))],
        ef=100, limit=20,
    ))

    p = build_postings(docs).cache()
    p.count()
    st = corpus_stats(docs)
    cap("q_bm25_build", build_postings(docs))
    cap("q_bm25", search_bm25(
        docs, "spark window merge", limit=10, postings=p, stats=st))

    cb = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
    cap("q_pq", quantize(emb, "embedding", cb).select(
        F.sum(F.element_at("embedding_pq", 1))))

    idx = build_ivf(emb, "embedding", nlist=16, seed=42)
    idx.assigned.cache().count()
    qs = sample_queries(emb, "embedding", n=10, seed=7)
    cap("q_ivf", ivf_search_batch(idx, qs, k=10, nprobe=10, id_col="vec_id"))

    cap("q_minhash", minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5))

    qdf = emb.limit(32).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    cap("q_knn_join", knn_join(emb, "embedding", qdf, "qv", k=10, id_col="vec_id"))

    from lanterndb_spark.streaming.sessions import sessionize_batch
    cap("q_sessionize", sessionize_batch(t["events"], gap="30 minutes"))

    from lanterndb_spark.operators.temporal import asof_join
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    cap("q_asof", asof_join(clicks, purch, on="ts", by="user_id",
                            tolerance=86400.0))

    from lanterndb_spark.operators.paragraphs import remove_duplicate_paragraphs
    cap("q_para", remove_duplicate_paragraphs(docs, chunk_tokens=16, sep=" "))

    cap("q_tpch_q1", li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        F.avg("l_quantity"), F.count("*"),
    ))

    from lanterndb_spark.operators.curate import curate
    cap("q_curate", curate(docs).filter("kept"))

    from lanterndb_spark.operators.contamination import decontaminate
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    corpus = docs.filter(F.col("doc_id") % 19 != 0)
    cap("q_decontam", decontaminate(corpus, bench, n=5).filter("contaminated"))

    from lanterndb_spark.functions.pii import scrub
    from lanterndb_spark.operators.packing import pack_contiguous
    cap("q_pii_scrub", scrub(docs).filter("has_pii"))
    cap("q_pii_pack", pack_contiguous(docs, budget=2048, n_buckets=64))

    # batch block
    nq_b = 2000
    qrows = [(i, q) for i, q in enumerate(qs * (nq_b // 10))]
    qdf_b = spark.createDataFrame(
        qrows[:nq_b], "q_id int, query array<double>").persist()
    qdf_b.count()
    cap("ivfdf_2k", ivf_search_df(idx, qdf_b, k=10, nprobe=10, id_col="vec_id"))

    qtexts = [
        "spark window merge", "broadcast join plan",
        "stream state checkpoint", "partition data table",
        "query engine index", "shuffle spill memory",
        "columnar scan filter", "hash aggregate group",
    ]
    qdf_t = spark.createDataFrame(
        [(i, qtexts[i % len(qtexts)]) for i in range(64)],
        "q_id int, query string")
    cap("bm25df_64", search_bm25_df(docs, qdf_t, limit=10, postings=p, stats=st))

    emb2 = emb.select(
        "vec_id", "embedding", F.reverse("embedding").alias("emb_r"))
    qdf_h = spark.createDataFrame(
        [(i, q, list(reversed(q))) for i, q in enumerate(qs * (256 // 10 + 1))][:256],
        "q_id int, qv array<double>, qv_r array<double>").persist()
    qdf_h.count()
    cap("hybriddf_256", weighted_vector_search_df(
        emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
        qdf_h, id_col="vec_id", ef=20, limit=10,
        indexes={"embedding": idx}, nprobe=4,
    ))

    spark.stop()


if __name__ == "__main__":
    main()
