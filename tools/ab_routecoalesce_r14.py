"""Interleaved A/B for the r14 routing-pass coalesce
(plans.shape.coalesce_known_small): known-small query batches route in
ceil(rows/1024) Python tasks instead of one near-empty task per input
partition. Arms alternate inside ONE session by patching the helper to
identity (the pre-change behavior); rows are asserted identical per pair.
Writes spark-warehouse/ab_routecoalesce_r14.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lanterndb_spark.session import get_spark, load_tables  # noqa: E402
from lanterndb_spark.plans import shape  # noqa: E402
from lanterndb_spark.plans.shape import release  # noqa: E402
from lanterndb_spark.operators.ivf import build_ivf, ivf_search_df  # noqa: E402
from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df  # noqa: E402
from lanterndb_spark.operators.hybrid import weighted_vector_search_df  # noqa: E402
from lanterndb_spark.operators.autotune import sample_queries  # noqa: E402

spark = get_spark()
sc = spark.sparkContext
t = load_tables(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
emb = t["embeddings"]
emb.cache().count()

idx = build_ivf(emb, "embedding", nlist=16, seed=42)
idx.assigned.cache().count()
qs = sample_queries(emb, "embedding", n=10, seed=7)

qdf_b = spark.createDataFrame(
    [(i, q) for i, q in enumerate(qs * 200)], "q_id int, query array<double>"
).persist()
qdf_b.count()

hidx = build_hnsw(emb, "embedding", id_col="vec_id", num_shards=8, seed=42)
hidx.graphs.cache().count()

emb2 = emb.select("vec_id", "embedding", F.reverse("embedding").alias("emb_r"))
qdf_h = spark.createDataFrame(
    [(i, q, list(reversed(q))) for i, q in enumerate(qs * 26)][:256],
    "q_id int, qv array<double>, qv_r array<double>",
).persist()
qdf_h.count()

_real = shape.coalesce_known_small
_identity = lambda df, stats_of, rows_per_task=1024: df  # noqa: E731


def run_ivfdf():
    out = ivf_search_df(idx, qdf_b, k=10, nprobe=10, id_col="vec_id")
    rows = sorted((r[0], r[1], round(r[2], 9)) for r in out.collect())
    release(out)
    return rows


qdf_s = qdf_b.limit(500).persist()
qdf_s.count()


def run_hnswdf():
    out = hnsw_search_df(hidx, qdf_s, k=10, nprobe=4,
                         q_id_col="q_id", q_vec_col="query")
    return sorted((r[0], r[1], round(r[2], 9)) for r in out.collect())


def run_hybriddf():
    out = weighted_vector_search_df(
        emb2, [(1.0, "embedding", "qv"), (0.5, "emb_r", "qv_r")],
        qdf_h, id_col="vec_id", ef=20, limit=10,
        indexes={"embedding": idx}, nprobe=4)
    rows = sorted((r[0], r[1], round(r[-1], 9)) for r in out.collect())
    release(out)
    return rows


def ab(fn, pairs=6):
    olds, news = [], []
    for i in range(pairs):
        shape.coalesce_known_small = _identity
        sc.setJobDescription(f"{fn.__name__}_old#{i}")
        t0 = time.monotonic()
        ra = fn()
        olds.append(round(time.monotonic() - t0, 3))
        shape.coalesce_known_small = _real
        sc.setJobDescription(f"{fn.__name__}_new#{i}")
        t0 = time.monotonic()
        rb = fn()
        news.append(round(time.monotonic() - t0, 3))
        assert ra == rb, f"{fn.__name__} pair {i}: arm outputs differ"
    ds = sorted(o - n for o, n in zip(olds, news))
    return {"old_s": olds, "new_s": news,
            "old_median": statistics.median(olds),
            "new_median": statistics.median(news),
            "paired_delta_median_s": round(statistics.median(ds), 3),
            "rows_identical": True}


result = {
    "what": "interleaved same-session A/B of the routing-pass coalesce "
            "(identity-patched helper = pre-change arm); rows asserted "
            "identical per pair",
    "conditions": {"load_1m_at_start": os.getloadavg()[0],
                   "cpus": os.cpu_count()},
    "ivfdf_2k": ab(run_ivfdf),
    "hnswdf_500": ab(run_hnswdf),
    "hybriddf_256": ab(run_hybriddf),
}
shape.coalesce_known_small = _real
with open(os.path.join(REPO, "spark-warehouse", "ab_routecoalesce_r14.json"),
          "w") as fh:
    json.dump(result, fh, indent=1)
print(json.dumps(result, indent=1))
