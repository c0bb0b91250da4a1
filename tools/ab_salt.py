#!/usr/bin/env python
"""A/B the ivf_search_df cogroup salt at the 2M tier.

The 20M smoke measured ~137 ns per probed row through the arrow
cogroup — ~50x the dgemm floor — so the batch scorer is OVERHEAD-bound
(arrow/pandas (de)serialization + per-key python), not flops-bound.
``salt`` multiplies the QUERY side of that overhead: routed queries
explode x salt, so every (cluster, salt) key deserializes and converts
the cluster's FULL routed query set. salt=8 was picked for per-task
memory at 2M/nlist=64; this measures what it costs when the memory
bound doesn't bind.

    python tools/ab_salt.py            # 2M corpus, salts 1/2/4/8
    CP_N=20000000 CP_NLIST=256 CP_NPROBE=32 python tools/ab_salt.py 1 8

Prints one JSON line; paste into spark-warehouse/ab_salt_r11.json.
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


def main():
    n = int(os.environ.get("CP_N", "2000000"))
    nlist = int(os.environ.get("CP_NLIST", "64"))
    nprobe = int(os.environ.get("CP_NPROBE", "8"))
    nq = int(os.environ.get("CP_NQ", "120000"))
    salts = [int(s) for s in sys.argv[1:]] or [1, 2, 4, 8]
    import scale_smoke

    spark = get_spark(app_name="ab-salt")
    spark.sparkContext.setLogLevel("ERROR")
    emb, _ = scale_smoke.gen(spark, n, 1000, dim=64)

    from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df
    from lanterndb_spark.plans.shape import release

    index = build_ivf(emb, "embedding", nlist=nlist, seed=42)
    index.assigned.persist().count()

    rng = np.random.default_rng(11)
    picks = [int(p) for p in rng.integers(0, n, size=nq)]
    qdf = (
        spark.createDataFrame(
            [(i, p) for i, p in enumerate(picks)], "q_id bigint, vec_id bigint"
        )
        .join(emb.select("vec_id", "embedding"), on="vec_id")
        .select("q_id", F.col("embedding").cast("array<double>").alias("query"))
        .persist()
    )
    qdf.count()

    out = {"n": n, "nlist": nlist, "nprobe": nprobe, "nq": nq, "runs": {}}
    baseline_rows = None
    for salt in salts:
        t0 = time.monotonic()
        res = ivf_search_df(
            index, qdf, k=10, nprobe=nprobe, id_col="vec_id", salt=salt
        )
        rows = res.count()
        dt = round(time.monotonic() - t0, 1)
        release(res)
        if baseline_rows is None:
            baseline_rows = rows
        assert rows == baseline_rows, f"salt={salt} changed the row count"
        out["runs"][f"salt_{salt}"] = {"s": dt, "rows": rows}
        print(f"  salt={salt}: {dt}s ({rows} rows)", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
