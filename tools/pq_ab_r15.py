#!/usr/bin/env python
"""q_pq decomposition + Catalyst-argmin encode prototype A/B (VERDICT r14
item 5). Phases: codebook train+collect vs full-table encode+agg. The
prototype expresses the per-subvector argmin as ONE parsed SQL expression
(codebook centroids as literals, |c|^2 - 2<v,c> comparison — the |v_sub|^2
term is rank-invariant and dropped), asserts the codes equal the numpy
encoder's on the full table, and interleaves timed reps of both encode
forms. Artifact: spark-warehouse/pq_ab_r15.json.
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


def catalyst_encode_expr(cb: list[np.ndarray], vec_col: str) -> str:
    """SQL text of the PQ encode: array of per-subvector argmin centroid
    ids. d_j compares |c_j|^2 - 2<v_sub, c_j> (monotone twin of the
    squared distance); array_position(.., array_min(..)) - 1 is the
    FIRST minimal index, numpy argmin's tie rule."""
    dim = sum(a.shape[1] for a in cb)
    from lanterndb_spark.operators.pq import subvector_bounds

    bounds = subvector_bounds(dim, len(cb))
    parts = []
    for (lo, _hi), book in zip(bounds, cb):
        ds = []
        for c in book:
            dot = " + ".join(
                f"CAST(element_at({vec_col}, {lo + k + 1}) AS DOUBLE) * {float(x)!r}"
                for k, x in enumerate(c)
            )
            norm = float((np.asarray(c, dtype=np.float64) ** 2).sum())
            ds.append(f"({norm!r} - 2.0 * ({dot}))")
        arr = "array(" + ", ".join(ds) + ")"
        parts.append(
            f"CAST(array_position({arr}, array_min({arr})) - 1 AS SMALLINT)"
        )
    return "array(" + ", ".join(parts) + ")"


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pq-ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    emb.cache().count()

    from lanterndb_spark.operators.pq import (
        _codebook_arrays, quantize, train_codebook,
    )

    out: dict = {"sf": sf_dir}

    # phase decomposition
    reps = 5
    tr, enc = [], []
    for _ in range(reps):
        t0 = time.monotonic()
        cb_df = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
        cb = _codebook_arrays(cb_df)
        tr.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        quantize(emb, "embedding", cb_df).select(
            F.sum(F.element_at("embedding_pq", 1))
        ).collect()
        enc.append(round(time.monotonic() - t0, 3))
    out["train_collect_s"] = tr
    out["encode_pandas_s"] = enc

    # NOTE: quantize() re-collects the codebook internally; reuse cb for
    # the expression build
    expr = catalyst_encode_expr(cb, "embedding")
    out["expr_chars"] = len(expr)

    # code equality on the full table (numpy path vs Catalyst path)
    pandas_codes = {
        r["vec_id"]: list(r["embedding_pq"])
        for r in quantize(emb, "embedding", train_codebook(
            emb, "embedding", splits=8, clusters=16, seed=42)).select(
            "vec_id", "embedding_pq").collect()
    }
    cat_codes = {
        r["vec_id"]: list(r["c"])
        for r in emb.select("vec_id", F.expr(expr).alias("c")).collect()
    }
    mism = [k for k in pandas_codes if pandas_codes[k] != cat_codes[k]]
    out["n_rows"] = len(pandas_codes)
    out["n_code_mismatches"] = len(mism)

    # interleaved encode-only A/B (codebook prebuilt both arms)
    cb_df = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
    cb_rows = cb_df.collect()
    cb_local = spark.createDataFrame(cb_rows, cb_df.schema)  # pin: no re-train
    pu, ca = [], []
    for _ in range(7):
        t0 = time.monotonic()
        quantize(emb, "embedding", cb_local).select(
            F.sum(F.element_at("embedding_pq", 1))).collect()
        pu.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        emb.select(F.expr(expr).alias("embedding_pq")).select(
            F.sum(F.element_at("embedding_pq", 1))).collect()
        ca.append(round(time.monotonic() - t0, 3))
    out["ab_encode_pandas_s"] = pu
    out["ab_encode_catalyst_s"] = ca
    out["ab_pandas_median"] = statistics.median(pu[1:])
    out["ab_catalyst_median"] = statistics.median(ca[1:])

    print(json.dumps(out))
    with open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", "pq_ab_r15.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
