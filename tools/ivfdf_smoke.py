"""ivf_search_df smoke at the 2M tier: the ivf batch ceiling is gone.

Evidence for the round-9 recast (VERDICT r8 item 2): the old
knn_batch[ivf] route hard-errored past 100k driver-collected queries;
ivf_search_df routes queries executor-side, so this smoke runs query
volumes the old route refused (120k), checks spot recall vs exact, and
measures the expr-vs-arrow scoring crossover that sets
_ARROW_DF_CROSSOVER.

    python tools/ivfdf_smoke.py             # full: crossover + 120k run
    CP_NQ=10000 python tools/ivfdf_smoke.py # single volume

Writes spark-warehouse/ivfdf_smoke_r9.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark  # noqa: E402


def main():
    n = int(os.environ.get("CP_N", "2000000"))
    d = 64
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_smoke import gen  # reuse the persisted 2M parquet

    spark = get_spark(app_name="ivfdf-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = gen(spark, n, 1000, dim=d)
    emb = emb.persist()
    emb.count()

    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df

    t0 = time.monotonic()
    index = build_ivf(emb, "embedding", nlist=64, seed=42)
    index.assigned.persist().count()
    build_s = round(time.monotonic() - t0, 1)

    def qdf_of(nq, seed=11):
        rng = np.random.default_rng(seed)
        picks = [int(p) for p in rng.integers(0, n, size=nq)]
        return (
            spark.createDataFrame(
                [(i, p) for i, p in enumerate(picks)], "q_id bigint, vec_id bigint"
            )
            .join(emb.select("vec_id", "embedding"), on="vec_id")
            .select("q_id", F.col("embedding").alias("query"))
            .persist()
        )

    def run(nq, impl):
        qdf = qdf_of(nq)
        qdf.count()
        t0 = time.monotonic()
        got = ivf_search_df(
            index, qdf, k=10, nprobe=8, id_col="vec_id", impl=impl
        )
        nres = got.count()
        dt = round(time.monotonic() - t0, 1)
        qdf.unpersist()
        return dt, nres

    out = {"n": n, "dim": d, "nlist": 64, "nprobe": 8, "build_s": build_s}

    nq_env = os.environ.get("CP_NQ")
    if nq_env:
        volumes = [(int(nq_env), "auto")]
    else:
        # bracket the density crossover (_ARROW_QPC_CROSSOVER is in
        # queries per probed cluster = nq x nprobe / nlist; here
        # nprobe/nlist = 1/8 so nq=128 -> density 16, nq=256 -> 32),
        # then the past-the-old-ceiling volume. expr stops at 256: its
        # cost is interpreted folds x (nq x n x nprobe/nlist) pairs —
        # the very curve the arrow kernel escapes (1024-expr measured
        # 328.8 s vs arrow 24.1 s in the first r9 run; kept in the
        # record, not re-run).
        volumes = [
            (128, "expr"), (128, "arrow"),
            (256, "expr"), (256, "arrow"),
            (4096, "arrow"),
            (120_000, "arrow"),
        ]
    runs = []
    for nq, impl in volumes:
        dt, nres = run(nq, impl)
        runs.append({"nq": nq, "impl": impl, "search_s": dt, "rows": nres})
        print(json.dumps(runs[-1]), flush=True)
    out["runs"] = runs

    # spot recall vs exact on 20 queries of the LAST volume's config
    from lanterndb_spark.operators.autotune import (
        exact_topk_batch, recall_at_k,
    )
    rng = np.random.default_rng(3)
    picks = [int(p) for p in rng.integers(0, n, size=20)]
    qdf = qdf_of(20, seed=3)
    got = ivf_search_df(index, qdf, k=10, nprobe=8, id_col="vec_id")
    by_q = {}
    for r in got.collect():
        by_q.setdefault(int(r["q_id"]), []).append((r["dist"], int(r["vec_id"])))
    qs = [
        [float(x) for x in r["query"]]
        for r in qdf.orderBy("q_id").collect()
    ]
    truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
    rec = sum(
        recall_at_k([i for _, i in sorted(by_q.get(q, []))], truth.get(q, []))
        for q in range(len(qs))
    ) / len(qs)
    out["spot_recall_at_10"] = round(rec, 3)

    os.makedirs("spark-warehouse", exist_ok=True)
    with open("spark-warehouse/ivfdf_smoke_r9.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
