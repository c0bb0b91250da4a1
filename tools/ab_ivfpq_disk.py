#!/usr/bin/env python
"""Disk-tier A/B for the PQ design claim (VERDICT r11 item 4): the
whole case for ivfpq over plain ivf is "the coarse scan reads 1
byte/subvector instead of 4/8 bytes/dim, which wins when the coarse
table comes OFF DISK" (the reference's quantized-scan analogue,
scan.c:75-81) — but every r10/r11 measurement ran against a CACHED
coarse table, where ivfpq LOSES 2-7x (the ADC gather costs more than
the saved memory traffic). This measures where the crossover actually
is:

- both indexes' assigned tables are WRITTEN TO PARQUET and read back
  un-persisted, so every batch pays the scan (column pruning lets the
  pq route read only the code column — the 30x byte difference IS the
  mechanism under test);
- then both are persisted and re-run in the same session, giving the
  in-RAM comparison on the same box/clock.

Caveat recorded in the artifact: local mode cannot evict the OS page
cache, so "disk" here means parquet-decode + full-column
materialization cost, not cold-device I/O — at 100 TB the gap widens
in pq's favor (real disks add bandwidth cost proportional to the same
bytes).

Usage: python tools/ab_ivfpq_disk.py
Knobs: AB_NVEC (default 20,000,000), AB_NQ (20,000), AB_NLIST (256),
AB_NPROBE (32), AB_HEAP (48g). AB_DROP_CACHES=1 (needs root) syncs and
drops the OS page cache before every disk-tier batch, upgrading the
"disk" arm from page-cached parquet decode to REAL cold-device reads —
the regime the PQ scan-byte claim is actually about; the output file
gains a _cold suffix.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WAREHOUSE = os.path.join(REPO, "spark-warehouse")
DROP_CACHES = os.environ.get("AB_DROP_CACHES") == "1"
OUT_PATH = os.path.join(
    WAREHOUSE, f"ab_ivfpq_disk_r12{'_cold' if DROP_CACHES else ''}.json"
)


def drop_page_cache():
    """sync + drop the OS page cache so the next parquet scan reads the
    device, not RAM. Root-only; the A/B refuses to claim a cold tier it
    cannot produce."""
    subprocess.run(["sync"], check=True)
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3\n")

N_VEC = int(os.environ.get("AB_NVEC", "20000000"))
N_Q = int(os.environ.get("AB_NQ", "20000"))
NLIST = int(os.environ.get("AB_NLIST", "256"))
NPROBE = int(os.environ.get("AB_NPROBE", "32"))
SPLITS, CLUSTERS = 8, 256
REFINE = 4


def du_mb(path: str) -> int:
    out = subprocess.run(["du", "-sm", path], capture_output=True, text=True)
    return int(out.stdout.split()[0])


def main():
    import numpy as np

    os.environ.setdefault("SPARK_DRIVER_MEMORY", os.environ.get("AB_HEAP", "48g"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import scale_smoke

    from lanterndb_spark.operators.ivf import (
        IvfIndex, build_ivf, ivf_search_df, ivfpq_search_df,
    )
    from lanterndb_spark.operators.pq import quantize, train_codebook
    from lanterndb_spark.plans.shape import release
    from lanterndb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {
        "what": "ivfpq vs ivf batch wall with the coarse table read from "
                "parquet every run (disk tier) AND persisted (in-RAM), "
                "same session — locates the crossover the PQ design "
                "claims (scan bytes 30x smaller)",
        "caveat": "local mode cannot evict the OS page cache; 'disk' = "
                  "parquet decode + column materialization, a lower bound "
                  "on the real disk-tier gap",
        "shape": {"n_vec": N_VEC, "nq": N_Q, "nlist": NLIST,
                  "nprobe": NPROBE, "splits": SPLITS, "clusters": CLUSTERS,
                  "refine": REFINE, "k": 10},
        "stages": {},
    }

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        dt = round(time.monotonic() - t0, 2)
        rec["stages"][label] = dt
        print(f"{label}: {dt}s", flush=True)
        return out

    emb, _ = scale_smoke.gen(spark, N_VEC, 1000, dim=64)
    emb = emb.select("vec_id", "embedding")

    IVF = timed("build_ivf", lambda: build_ivf(emb, "embedding", nlist=NLIST, seed=42))
    cb = timed("train_codebook", lambda: train_codebook(
        emb, "embedding", splits=SPLITS, clusters=CLUSTERS, seed=42))

    ivf_path = os.path.join(WAREHOUSE, "ab_disk_ivf")
    pq_path = os.path.join(WAREHOUSE, "ab_disk_pq")
    timed("write_ivf_assigned", lambda: IVF.assigned.write.mode("overwrite")
          .partitionBy("cluster_id").parquet(ivf_path))
    timed("write_pq_assigned", lambda: quantize(IVF.assigned, "embedding", cb)
          .write.mode("overwrite").partitionBy("cluster_id").parquet(pq_path))
    rec["on_disk_mb"] = {"ivf": du_mb(ivf_path), "pq": du_mb(pq_path)}
    print("sizes:", rec["on_disk_mb"], flush=True)

    centroids = IVF.centroids
    ivf_idx = IvfIndex(spark.read.parquet(ivf_path), centroids, "embedding")
    pq_idx = IvfIndex(spark.read.parquet(pq_path), centroids, "embedding")

    rng = np.random.default_rng(77)
    qm = rng.standard_normal((N_Q, 64))
    qdf = spark.createDataFrame(
        [(int(i), qm[i].tolist()) for i in range(N_Q)],
        "q_id long, query array<double>",
    ).persist()
    qdf.count()

    def run_ivf():
        res = ivf_search_df(
            ivf_idx, qdf, k=10, nprobe=NPROBE, id_col="vec_id",
            impl="arrow", unique_q_ids=True,
        )
        n = res.count()
        release(res)
        return n

    def run_pq():
        res = ivfpq_search_df(
            pq_idx, cb, qdf, k=10, nprobe=NPROBE, refine=REFINE,
            pq_col="embedding_pq", id_col="vec_id", unique_q_ids=True,
        )
        n = res.count()
        release(res)
        return n

    # ---- disk tier: nothing persisted, every run re-scans parquet ----
    spark.catalog.clearCache()
    if DROP_CACHES:
        rec["caveat"] = (
            "page cache DROPPED (sync + /proc/sys/vm/drop_caches=3) "
            "before every disk batch: real cold-device reads"
        )
    for i in (1, 2):
        if DROP_CACHES:
            drop_page_cache()
        timed(f"disk_ivf_batch_{i}", run_ivf)
    for i in (1, 2):
        if DROP_CACHES:
            drop_page_cache()
        timed(f"disk_pq_batch_{i}", run_pq)

    # ---- in-RAM tier: same indexes persisted, same queries ----------
    ivf_idx.assigned.persist().count()
    for i in (1, 2):
        timed(f"ram_ivf_batch_{i}", run_ivf)
    ivf_idx.assigned.unpersist()
    pq_idx.assigned.persist().count()
    for i in (1, 2):
        timed(f"ram_pq_batch_{i}", run_pq)
    pq_idx.assigned.unpersist()

    s = rec["stages"]
    rec["summary"] = {
        "disk_pq_vs_ivf": round(
            min(s["disk_pq_batch_1"], s["disk_pq_batch_2"])
            / min(s["disk_ivf_batch_1"], s["disk_ivf_batch_2"]), 2),
        "ram_pq_vs_ivf": round(
            min(s["ram_pq_batch_1"], s["ram_pq_batch_2"])
            / min(s["ram_ivf_batch_1"], s["ram_ivf_batch_2"]), 2),
    }
    with open(OUT_PATH, "w") as f:
        json.dump(rec, f, indent=2)
    print("wrote", OUT_PATH)
    print(json.dumps(rec["summary"]))


if __name__ == "__main__":
    main()
