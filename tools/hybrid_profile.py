#!/usr/bin/env python
"""Stage profile of the 10x-tier batch hybrid (VERDICT r10 item 7).

Reproduces batch_smoke.py's hybriddf_2k shape (2k queries, two ivf-
routed terms over 2M x 64 vectors) and times each piece separately:

  term1 / term2   the per-term ivf_search_df candidate stage alone
  full            the whole weighted_vector_search_df (candidates +
                  dedup union + joint-score join + rank window)

full - (term1 + term2) isolates the joint stage; whether the candidate
stages dominate decides if overlapping the per-term searches (union of
routed frames before a shared window) is worth pursuing — VERDICT r10
says act only on a profile. Writes spark-warehouse/hybrid_profile_r11.json.
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
    n_vec = int(os.environ.get("CP_NVEC", "2000000"))
    from scale_smoke import gen

    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df
    from lanterndb_spark.plans.shape import release

    spark = get_spark(app_name="hybrid-profile")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _docs = gen(spark, n_vec, 1000, dim=64)
    out = {"n_vec": n_vec}

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
    out["nq"] = qdf.count()

    for name, idx, qc in (("term1", idx1, "qv1"), ("term2", idx2, "qv2")):
        t0 = time.monotonic()
        res = ivf_search_df(
            idx, qdf.select("q_id", qc), k=50, nprobe=8,
            id_col="id", q_vec_col=qc,
        )
        res.count()
        out[f"{name}_s"] = round(time.monotonic() - t0, 1)
        release(res)

    t0 = time.monotonic()
    res = weighted_vector_search_df(
        df, [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")], qdf,
        ef=50, limit=10, nprobe=8,
        indexes={"v1": idx1, "v2": idx2},
    )
    out["full_rows"] = res.count()
    out["full_s"] = round(time.monotonic() - t0, 1)
    release(res)
    out["joint_stage_s"] = round(
        out["full_s"] - out["term1_s"] - out["term2_s"], 1
    )

    with open("spark-warehouse/hybrid_profile_r11.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
