#!/usr/bin/env python
"""Recall-vs-knob curves at the 20M tier — the smoke_20m follow-up.

smoke_20m_r11.json found that recall at FIXED knobs degrades one tier
up (ivf 0.73 @ nprobe=32, hnsw 0.592 @ ef=64/nprobe=32, ivfpq 0.232 @
refine=4) on isotropic gaussian data — the no-structure worst case for
any routing. The question that decides whether that is a ceiling or a
knob curve: does raising the existing knobs (nprobe / ef / refine —
exactly what autotune_* grid over, index_autotune/mod.rs:188-254's
contract) buy the recall back at linear, recorded cost?

For each backend this measures, per knob setting:
  - recall@10 on N_SPOT sampled queries against exact brute force
    over the full 20M table (ground truth computed ONCE and reused)
  - batch wall clock at N_TIME queries through the DataFrame-native
    form (the unbounded route, ms/query)

Reuses the smoke's cached parquet under spark-warehouse/scale_smoke.
Writes spark-warehouse/recall_20m_r11.json and prints one JSON line.

    python tools/recall_20m.py            # all backends
    python tools/recall_20m.py ivf hnsw   # subset
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark  # noqa: E402

N_VEC = int(os.environ.get("CP_NVEC", "20000000"))
N_DOC = int(os.environ.get("CP_NDOC", "5000000"))
N_SPOT = int(os.environ.get("CP_NSPOT", "100"))
N_TIME = int(os.environ.get("CP_NTIME", "10000"))
DIM = 64
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "recall_20m_r11.json",
)


def main():
    backends = set(sys.argv[1:]) or {"ivf", "ivfpq", "ivfsq", "hnsw"}
    import scale_smoke

    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )
    from lanterndb_spark.plans.shape import release

    spark = get_spark(
        app_name="recall-20m",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale_smoke._SPARK = spark
    emb, _docs = scale_smoke.gen(spark, N_VEC, N_DOC, dim=DIM)

    out: dict = {"n_vec": N_VEC, "n_spot": N_SPOT, "n_time": N_TIME}

    def flush():
        with open(OUT_PATH + ".partial", "w") as f:
            json.dump(out, f, indent=2)

    # ---- shared ground truth (one exact pass over 20M) ---------------
    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    t0 = time.monotonic()
    truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
    out["exact_truth_s"] = round(time.monotonic() - t0, 1)
    spot_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
    )

    def spot(search_fn) -> float:
        got = _collect_by_query(search_fn(spot_df), "vec_id")
        return round(
            sum(recall_at_k(got.get(i, []), truth.get(i, []))
                for i in range(len(qs))) / len(qs), 4,
        )

    rng = np.random.default_rng(11)
    picks = [int(p) for p in rng.integers(0, N_VEC, size=N_TIME)]
    time_df = (
        spark.createDataFrame(
            [(i, p) for i, p in enumerate(picks)], "q_id bigint, vec_id bigint"
        )
        .join(emb.select("vec_id", "embedding"), on="vec_id")
        .select("q_id", F.col("embedding").cast("array<double>").alias("query"))
        .persist()
    )
    time_df.count()

    def timed_batch(search_fn) -> dict:
        t0 = time.monotonic()
        res = search_fn(time_df)
        n = res.count()
        dt = time.monotonic() - t0
        release(res)
        return {"batch_s": round(dt, 1), "ms_per_q": round(dt * 1000 / N_TIME, 2),
                "rows": n}

    # merge into an existing record so backend-subset runs accumulate
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            prior = json.load(f)
        prior.update(out)
        out = prior

    # ---- ivf ----------------------------------------------------------
    if "ivf" in backends or "ivfpq" in backends or "ivfsq" in backends:
        from lanterndb_spark.operators.ivf import build_ivf

        ivf = build_ivf(emb, "embedding", nlist=256, seed=42)
        ivf.assigned.persist().count()

    if "ivf" in backends:
        from lanterndb_spark.operators.ivf import ivf_search_df

        out["ivf"] = {}
        for nprobe in (32, 64, 96):
            fn = lambda q, np_=nprobe: ivf_search_df(
                ivf, q, k=10, nprobe=np_, id_col="vec_id"
            )
            out["ivf"][f"nprobe={nprobe}"] = {
                "recall_at_10": spot(fn), **timed_batch(fn)
            }
            flush()
            print(f"ivf nprobe={nprobe}: {out['ivf'][f'nprobe={nprobe}']}",
                  file=sys.stderr, flush=True)

    # ---- ivfpq --------------------------------------------------------
    if "ivfpq" in backends:
        from lanterndb_spark.operators.ivf import IvfPqIndex, ivfpq_search_df
        from lanterndb_spark.operators.pq import quantize, train_codebook

        cb = train_codebook(emb, "embedding", splits=8, clusters=256, seed=42)
        coded = quantize(ivf.assigned, "embedding", cb).persist()
        coded.count()
        pqidx = IvfPqIndex(coded, ivf.centroids, "embedding", cb)
        out["ivfpq"] = {}
        for nprobe, refine in ((32, 4), (32, 16), (64, 16), (64, 32)):
            fn = lambda q, np_=nprobe, rf=refine: ivfpq_search_df(
                pqidx, pqidx.codebook, q, k=10, nprobe=np_, refine=rf,
                id_col="vec_id",
            )
            key = f"nprobe={nprobe},refine={refine}"
            out["ivfpq"][key] = {"recall_at_10": spot(fn), **timed_batch(fn)}
            flush()
            print(f"ivfpq {key}: {out['ivfpq'][key]}", file=sys.stderr,
                  flush=True)
        coded.unpersist()

    # ---- ivfsq --------------------------------------------------------
    # the SQ8 contrast to PQ: scalar 8-bit codes keep the coarse
    # ranking nearly exact (the curve should track plain ivf), at 4x
    # less scan I/O vs f32 — the right compression for data with no
    # low-dim structure, where PQ's subvector distortion caps recall
    if "ivfsq" in backends:
        from lanterndb_spark.operators.ivf import IvfIndex, ivfsq_search_df
        from lanterndb_spark.operators.sq import sq8_quantize

        sqidx = IvfIndex(
            sq8_quantize(ivf.assigned, "embedding").persist(),
            ivf.centroids, "embedding",
        )
        sqidx.assigned.count()
        out["ivfsq"] = {}
        for nprobe, refine in ((32, 4), (64, 4)):
            fn = lambda q, np_=nprobe, rf=refine: ivfsq_search_df(
                sqidx, q, k=10, nprobe=np_, refine=rf, id_col="vec_id"
            )
            key = f"nprobe={nprobe},refine={refine}"
            out["ivfsq"][key] = {"recall_at_10": spot(fn), **timed_batch(fn)}
            flush()
            print(f"ivfsq {key}: {out['ivfsq'][key]}", file=sys.stderr,
                  flush=True)
        sqidx.assigned.unpersist()

    if "ivf" in backends or "ivfpq" in backends or "ivfsq" in backends:
        ivf.assigned.unpersist()

    # ---- hnsw ---------------------------------------------------------
    if "hnsw" in backends:
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

        t0 = time.monotonic()
        hnsw = build_hnsw(
            emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
            num_shards=512, routing="cluster", seed=42,
        )
        hnsw.graphs.persist().count()
        out["hnsw_build_s"] = round(time.monotonic() - t0, 1)
        out["hnsw"] = {}
        for ef, nprobe in ((64, 32), (64, 64), (128, 64), (128, 96)):
            fn = lambda q, e=ef, np_=nprobe: hnsw_search_df(
                hnsw, q, k=10, ef=e, nprobe=np_, unique_q_ids=True
            )
            key = f"ef={ef},nprobe={nprobe}"
            out["hnsw"][key] = {"recall_at_10": spot(fn), **timed_batch(fn)}
            flush()
            print(f"hnsw {key}: {out['hnsw'][key]}", file=sys.stderr,
                  flush=True)
        hnsw.graphs.unpersist()

    time_df.unpersist()
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
