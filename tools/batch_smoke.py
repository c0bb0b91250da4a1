"""10x-tier smoke for the round-9 batch recasts: search_bm25_df over
500k docs and weighted_vector_search_df over 2M x 2-column vectors.

Evidence that the batch forms hold past bench scale: one job per batch,
no driver-side per-query loop, candidate stages index-routed. Writes
spark-warehouse/batch_smoke_r9.json and prints one JSON line.

    python tools/batch_smoke.py
    CP_NDOC=50000 CP_NVEC=200000 python tools/batch_smoke.py   # quick
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark  # noqa: E402


def main():
    n_doc = int(os.environ.get("CP_NDOC", "500000"))
    n_vec = int(os.environ.get("CP_NVEC", "2000000"))
    from scale_smoke import gen

    spark = get_spark(app_name="batch-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb, docs = gen(spark, n_vec, n_doc, dim=64)
    out = {"n_doc": n_doc, "n_vec": n_vec}

    # ---- batch BM25: 256 queries of 3 rare-half vocab terms ----------
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25_df,
    )

    docs = docs.persist()
    docs.count()
    t0 = time.monotonic()
    p = build_postings(docs).persist()
    p.count()
    st = corpus_stats(docs)
    out["bm25_build_s"] = round(time.monotonic() - t0, 1)
    qrows = [
        (i, f"tok{50 + (i * 7) % 50} tok{50 + (i * 11) % 50} tok{50 + (i * 13) % 50}")
        for i in range(256)
    ]
    qdf = spark.createDataFrame(qrows, "q_id int, query string")
    t0 = time.monotonic()
    nres = search_bm25_df(docs, qdf, limit=10, postings=p, stats=st).count()
    out["bm25df_256_s"] = round(time.monotonic() - t0, 1)
    out["bm25df_256_rows"] = int(nres)
    p.unpersist()
    docs.unpersist()

    # ---- batch hybrid: 2k queries, both terms ivf-index-routed -------
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf

    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
        "label",
    ).persist()
    df.count()
    t0 = time.monotonic()
    idx1 = build_ivf(df, "v1", nlist=64, seed=42)
    idx1.assigned.persist().count()
    idx2 = build_ivf(df, "v2", nlist=64, seed=43)
    idx2.assigned.persist().count()
    out["ivf_builds_s"] = round(time.monotonic() - t0, 1)
    qdf = (
        df.filter(F.pmod(F.col("id"), F.lit(n_vec // 2000)) == 0)
        .limit(2000)
        .select(
            F.col("id").alias("q_id"),
            F.col("v1").alias("qv1"),
            F.col("v2").alias("qv2"),
        )
        .persist()
    )
    nq = qdf.count()
    t0 = time.monotonic()
    nres = weighted_vector_search_df(
        df, [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")], qdf,
        ef=50, limit=10, nprobe=8,
        indexes={"v1": idx1, "v2": idx2},
    ).count()
    out["hybriddf_nq"] = int(nq)
    out["hybriddf_s"] = round(time.monotonic() - t0, 1)
    out["hybriddf_rows"] = int(nres)

    os.makedirs("spark-warehouse", exist_ok=True)
    with open("spark-warehouse/batch_smoke_r9.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
