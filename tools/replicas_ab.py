#!/usr/bin/env python
"""A/B of cluster-routing multi-assignment (build_hnsw replicas=2).

The r11 20M curve showed single-assignment shard routing capping
recall on isotropic data (0.579 @ ef=64/nprobe=32 of 512) because a
query's true neighbors scatter across cells it does not probe.
Multi-assignment puts every row in its `replicas` nearest cells, so
the same partial probe sees each boundary row from both sides — this
measures what that buys and what it costs at the 2M tier:

  build wall (r=1 vs r=2), recall@10 on 100 spot queries vs exact
  truth, and 10k-query batch wall, at nprobe 32 and 64 of 512 shards.

Writes spark-warehouse/replicas_ab_r11.json and prints one JSON line.
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

N_VEC = int(os.environ.get("CP_NVEC", "2000000"))
N_SPOT = 100
N_TIME = 10000
# which factors to measure, e.g. CP_REPS=2 to skip the r=1 baseline
# when a prior record already carries it (the 20M curve has r=1)
REPS = tuple(int(x) for x in os.environ.get("CP_REPS", "1,2").split(","))
# suffix derives from the ACTUAL tier so the filename always matches the
# measured corpus (ADVICE r11: a >=10M threshold labelled 10M runs "_20m");
# non-multiples of 1M keep the raw count (no floor-to-"_0m"/"_1m"
# mislabels); the round label comes from AB_ROUND so re-runs never
# silently overwrite a prior round's committed record
_TIER = (
    "" if N_VEC == 2_000_000
    else f"_{N_VEC // 1_000_000}m" if N_VEC % 1_000_000 == 0
    else f"_{N_VEC}"
)
_ROUND = os.environ.get("AB_ROUND", "r12")
OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse",
    f"replicas_ab_{_ROUND}{_TIER}.json",
)


def main():
    import scale_smoke

    from lanterndb_spark.operators.autotune import (
        _collect_by_query, exact_topk_batch, recall_at_k, sample_queries,
    )
    from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df
    from lanterndb_spark.plans.shape import release

    spark = get_spark(
        app_name="replicas-ab",
        # replicated 20M+ local runs need ~80g (the r11 OOM was the
        # doubled shard blobs beside the cached table in ONE JVM;
        # DESIGN.md "local-JVM measurement ceiling")
        extra_conf={
            "spark.driver.memory": os.environ.get("AB_HEAP", "48g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    scale_smoke._SPARK = spark
    emb, _docs = scale_smoke.gen(spark, N_VEC, 1000, dim=64)

    out: dict = {"n_vec": N_VEC, "n_spot": N_SPOT, "n_time": N_TIME}
    qs = sample_queries(emb, "embedding", n=N_SPOT, seed=7)
    truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
    spot_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qs)],
        "q_id bigint, query array<double>",
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

    for r in REPS:
        t0 = time.monotonic()
        idx = build_hnsw(
            emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
            num_shards=512, routing="cluster", seed=42, replicas=r,
        )
        rec = {"build_s": round(time.monotonic() - t0, 1)}
        for nprobe in (32, 64):
            got = _collect_by_query(
                hnsw_search_df(
                    idx, spot_df, k=10, ef=64, nprobe=nprobe,
                    unique_q_ids=True,
                ),
                "vec_id",
            )
            rec[f"recall@10,nprobe={nprobe}"] = round(
                sum(recall_at_k(got.get(i, []), truth[i])
                    for i in range(len(qs))) / len(qs), 4,
            )
            t0 = time.monotonic()
            res = hnsw_search_df(
                idx, time_df, k=10, ef=64, nprobe=nprobe, unique_q_ids=True
            )
            res.count()
            rec[f"batch10k_s,nprobe={nprobe}"] = round(time.monotonic() - t0, 1)
            release(res)
        idx.graphs.unpersist()
        out[f"replicas={r}"] = rec
        print(f"replicas={r}: {rec}", file=sys.stderr, flush=True)
        with open(OUT_PATH + ".partial", "w") as f:
            json.dump(out, f, indent=2)

    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
