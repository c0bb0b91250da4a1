"""Measure the worker-side graph-blob cache: repeated searches on one
index generation (the autotune-grid shape). Run twice:

    LDB_GRAPH_CACHE_MB=0 python tools/cache_probe.py   # cache off
    python tools/cache_probe.py                        # cache on (default)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lanterndb_spark.session import get_spark  # noqa: E402
from lanterndb_spark.operators.hnsw import (  # noqa: E402
    build_hnsw, hnsw_search_batch,
)


def main():
    n = int(os.environ.get("CP_N", "200000"))
    d = int(os.environ.get("CP_D", "64"))
    rounds = int(os.environ.get("CP_ROUNDS", "20"))
    spark = get_spark()
    rng = np.random.default_rng(7)
    X = rng.normal(size=(n, d)).astype(np.float32)
    pdf = [(int(i), X[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(pdf, "id bigint, emb array<float>").persist()
    df.count()
    t0 = time.monotonic()
    index = build_hnsw(df, "emb", "id", num_shards=16)
    build_s = time.monotonic() - t0
    qs = [X[rng.integers(0, n)].tolist() for _ in range(10)]
    # warm one round so JVM/codegen startup is out of the measurement
    hnsw_search_batch(index, qs, k=10, ef=64).collect()
    t0 = time.monotonic()
    for _ in range(rounds):
        hnsw_search_batch(index, qs, k=10, ef=64).collect()
    wall = time.monotonic() - t0
    print(
        f"cache_mb={os.environ.get('LDB_GRAPH_CACHE_MB', 'default')} "
        f"n={n} shards=16 rounds={rounds} build_s={build_s:.2f} "
        f"search_wall_s={wall:.3f} per_round_ms={wall / rounds * 1000:.1f}"
    )


if __name__ == "__main__":
    main()
