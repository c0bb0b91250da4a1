#!/usr/bin/env python
"""20M-vector / 5M-doc scale smoke — one tier above every prior record.

Rounds 7-10 proved the engine at 2M vectors / 500k docs; every
"unbounded / 100 TB" claim extrapolated from there. This runs the
index-backed batch family and the MinHash pair sweep at 10x that tier
on the SAME local[32] box, recording per-stage wall clock, shuffle
bytes, and Python-worker high-water RSS — either validating the
extrapolation or finding the next ceiling (the reference grew an
external index server precisely because build memory was ITS ceiling,
lantern_cli/src/external_index/server.rs:311-435).

Stages (each selectable; default all):

    gen      20M x 64 float32 vectors + 5.1M docs under spark-warehouse/
    ivf      build_ivf nlist=256 + ivf_search_df at 120k queries + recall
    ivfpq    codebook + 20M-row encode + ivfpq_search_df at 120k queries
    hnsw     cluster-routed 512-shard graph build + hnsw_search_df at
             120k queries (nprobe=32) + recall
    minhash  minhash_lsh_pairs over 5.1M docs (2% planted twins) +
             planted-recall check

    python tools/smoke_20m.py              # all stages
    python tools/smoke_20m.py ivf minhash  # subset

Writes spark-warehouse/smoke_20m_r11.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark  # noqa: E402

N_VEC = int(os.environ.get("CP_NVEC", "20000000"))
N_DOC = int(os.environ.get("CP_NDOC", "5000000"))
NQ = int(os.environ.get("CP_NQ", "120000"))
DIM = 64
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "smoke_20m_r11.json",
)


def worker_peak_rss_mb(spark) -> float:
    """Max high-water RSS (MB) across the reused Python workers — runs a
    32-partition probe so every worker slot reports. ru_maxrss is
    CUMULATIVE per worker process: per-stage readings are high-water
    marks up to that point, and a FLAT series across stages is the
    bounded-kernel signal."""
    def probe(batches):
        for _ in batches:
            pass
        kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        yield pd.DataFrame({"rss_kb": [int(kb)]})

    rows = (
        spark.range(0, 32, 1, 32)
        .mapInPandas(probe, "rss_kb long")
        .collect()
    )
    return round(max(r["rss_kb"] for r in rows) / 1024.0, 1)


def main():
    stages = set(sys.argv[1:]) or {"gen", "ivf", "ivfpq", "hnsw", "minhash"}
    import scale_smoke

    spark = get_spark(
        app_name="smoke-20m",
        extra_conf={
            "spark.ui.enabled": "true",  # shuffle-byte telemetry
            # local mode = one JVM: the 512 cached shard blobs (~6 GB)
            # plus the 20M-row assigned cache live in THIS heap
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale_smoke._SPARK = spark
    out: dict = {"n_vec": N_VEC, "n_doc": N_DOC, "nq": NQ, "stages": {}}
    rec = out["stages"]

    def timed(label, fn):
        r0, w0 = scale_smoke._shuffle_totals()
        t0 = time.monotonic()
        n = fn()
        dt = round(time.monotonic() - t0, 1)
        r1, w1 = scale_smoke._shuffle_totals()
        entry = {
            "s": dt,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "worker_peak_rss_mb": worker_peak_rss_mb(spark),
            "driver_peak_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
            ),
        }
        if isinstance(n, int):
            entry["rows"] = n
        rec[label] = entry
        print(f"  {label}: {json.dumps(entry)}", file=sys.stderr, flush=True)
        flush()
        return n

    def flush():
        # checkpoint the record after every stage — a killed run keeps
        # everything measured so far
        with open(OUT_PATH + ".partial", "w") as f:
            json.dump(out, f, indent=2)

    # ---- data ------------------------------------------------------
    if "gen" in stages:
        timed("gen", lambda: scale_smoke.gen(spark, N_VEC, N_DOC, dim=DIM) and 0)
    emb, docs = scale_smoke.gen(spark, N_VEC, N_DOC, dim=DIM)

    def qdf_of(nq, seed=11):
        rng = np.random.default_rng(seed)
        picks = [int(p) for p in rng.integers(0, N_VEC, size=nq)]
        q = (
            spark.createDataFrame(
                [(i, p) for i, p in enumerate(picks)],
                "q_id bigint, vec_id bigint",
            )
            .join(emb.select("vec_id", "embedding"), on="vec_id")
            .select("q_id", F.col("embedding").cast("array<double>").alias("query"))
            .persist()
        )
        q.count()
        return q

    def spot_recall(search_fn, n_spot=50, k=10) -> float:
        """recall@10 of search_fn(qdf) against exact brute force over
        the full 20M table, on n_spot sampled queries."""
        from lanterndb_spark.operators.autotune import (
            _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
        )

        qs = sample_queries(emb, "embedding", n=n_spot, seed=7)
        sq = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
            "q_id bigint, query array<double>",
        )
        got = _collect_by_query(search_fn(sq), "vec_id")
        truth = exact_topk_batch(emb, "embedding", qs, k=k, id_col="vec_id")
        return round(
            sum(recall_at_k(got.get(i, []), truth.get(i, []))
                for i in range(len(qs))) / len(qs),
            4,
        )

    # ---- ivf -------------------------------------------------------
    if "ivf" in stages or "ivfpq" in stages:
        from lanterndb_spark.operators.ivf import build_ivf

        def ivf_build():
            global IVF
            IVF = build_ivf(emb, "embedding", nlist=256, seed=42)
            return IVF.assigned.persist().count()

        timed("ivf_build_256", ivf_build)

    if "ivf" in stages:
        from lanterndb_spark.operators.ivf import ivf_search_df
        from lanterndb_spark.plans.shape import release

        qdf = qdf_of(NQ)

        def ivf_batch():
            res = ivf_search_df(IVF, qdf, k=10, nprobe=32, id_col="vec_id")
            n = res.count()
            release(res)
            return n

        timed(f"ivf_searchdf_{NQ // 1000}k", ivf_batch)
        rec["ivf_recall_at_10"] = spot_recall(
            lambda sq: ivf_search_df(IVF, sq, k=10, nprobe=32, id_col="vec_id")
        )
        flush()
        qdf.unpersist()

    # ---- ivfpq -----------------------------------------------------
    if "ivfpq" in stages:
        from lanterndb_spark.operators.ivf import IvfPqIndex, ivfpq_search_df
        from lanterndb_spark.operators.pq import quantize, train_codebook
        from lanterndb_spark.plans.shape import release

        def pq_encode():
            global PQIDX
            cb = train_codebook(emb, "embedding", splits=8, clusters=256, seed=42)
            coded = quantize(IVF.assigned, "embedding", cb).persist()
            n = coded.count()
            PQIDX = IvfPqIndex(coded, IVF.centroids, "embedding", cb)
            return n

        timed("pq_train_encode_20m", pq_encode)
        qdf = qdf_of(NQ)

        def pq_batch():
            res = ivfpq_search_df(
                PQIDX, PQIDX.codebook, qdf, k=10, nprobe=32, refine=4,
                id_col="vec_id",
            )
            n = res.count()
            release(res)
            return n

        timed(f"ivfpq_searchdf_{NQ // 1000}k", pq_batch)
        rec["ivfpq_recall_at_10"] = spot_recall(
            lambda sq: ivfpq_search_df(
                PQIDX, PQIDX.codebook, sq, k=10, nprobe=32, refine=4,
                id_col="vec_id",
            )
        )
        flush()
        PQIDX.assigned.unpersist()
        qdf.unpersist()

    if ("ivf" in stages or "ivfpq" in stages):
        IVF.assigned.unpersist()

    # ---- hnsw ------------------------------------------------------
    if "hnsw" in stages:
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df
        from lanterndb_spark.plans.shape import release

        def hnsw_build():
            global HNSW
            HNSW = build_hnsw(
                emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
                num_shards=512, routing="cluster", seed=42,
            )
            return HNSW.graphs.count()

        timed("hnsw_build_512shard_20m", hnsw_build)
        qdf = qdf_of(NQ)

        def hnsw_batch():
            res = hnsw_search_df(
                HNSW, qdf, k=10, ef=64, nprobe=32, unique_q_ids=True
            )
            n = res.count()
            release(res)
            return n

        timed(f"hnsw_searchdf_{NQ // 1000}k_np32", hnsw_batch)
        rec["hnsw_recall_at_10"] = spot_recall(
            lambda sq: hnsw_search_df(
                HNSW, sq, k=10, ef=64, nprobe=32, unique_q_ids=True
            )
        )
        flush()
        HNSW.graphs.unpersist()
        qdf.unpersist()

    # ---- minhash ---------------------------------------------------
    if "minhash" in stages:
        from lanterndb_spark.operators.dedup import minhash_lsh_pairs
        from lanterndb_spark.plans.shape import release

        def mh():
            res = minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=64, bands=16, n=3,
                threshold=0.7,
            )
            pairs = res.select("id_a", "id_b").persist()
            n = pairs.count()
            # planted twins live at doc_id + N_DOC for doc_id % 50 == 0:
            # measure how many were recovered (banding recall on true dups)
            twins = pairs.filter(
                (F.col("id_b") - F.col("id_a") == N_DOC)
                & (F.col("id_a") % 50 == 0)
            ).count()
            planted = N_DOC // 50
            rec["minhash_planted_recall"] = round(twins / planted, 4)
            pairs.unpersist()
            release(res)
            return n

        timed(f"minhash_pairs_{N_DOC // 1000}k", mh)

    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
