"""Decompose bm25df_64's driver-side pre-passes: dup-check, probe, core.

Times each piece in isolation on the bench's exact 64-row LocalRelation
query frame at sf0.1, 3 reps, medians. Read-only diagnosis tool.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from lanterndb_spark.session import get_spark, load_tables  # noqa: E402

spark = get_spark(app_name="bm25df-decomp-r14")
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, os.environ["SPARK_GRAFT_SF_DIR"])
docs = t["documents"]
docs.cache().count()

from pyspark.sql import functions as F  # noqa: E402
from lanterndb_spark.operators.bm25 import (  # noqa: E402
    build_postings, corpus_stats, search_bm25_df, _postings_worth_probe,
)
from lanterndb_spark.operators.hnsw import _has_duplicate_qids  # noqa: E402
from lanterndb_spark.functions.text import tokenize  # noqa: E402
from lanterndb_spark.plans.shape import explode_nonempty  # noqa: E402

p = build_postings(docs).persist()
p.count()
st = corpus_stats(docs)

qtexts = [
    "spark window merge", "broadcast join plan",
    "stream state checkpoint", "partition data table",
    "query engine index", "shuffle spill memory",
    "columnar scan filter", "hash aggregate group",
]
qdf_t = spark.createDataFrame(
    [(i, qtexts[i % len(qtexts)]) for i in range(64)],
    "q_id int, query string",
)

print("worth_probe:", _postings_worth_probe(p))

def med(fn, reps=5):
    xs = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        xs.append(time.monotonic() - t0)
    return round(statistics.median(xs), 4), [round(x, 4) for x in xs]

out = {}

# 1. dup-check alone
out["dupcheck"] = med(lambda: _has_duplicate_qids(qdf_t, "q_id"))

# 2. probe alone (as written: explode -> distinct -> limit -> collect).
# NOTE: hand-replicates the probe construction that lived at
# bm25.py:336-345 in r14 — a one-round diagnosis snapshot; if bm25.py's
# probe changes (r15 moved it to a window-free projection), this tool
# measures the r14 shape, not HEAD's (r14 ADVICE drift note).
from lanterndb_spark.operators.bm25 import STOPWORDS  # noqa: E402

def run_probe(coalesced):
    qt = tokenize("query", stopwords=STOPWORDS, stem=False)
    qterms = explode_nonempty(
        qdf_t.select(F.col("q_id").alias("__qid"), F.array_distinct(qt).alias("_qt")),
        "_qt", "term", "__qid",
    )
    sel = qterms.select("term")
    if coalesced:
        sel = sel.coalesce(1)
    return [r["term"] for r in sel.distinct().limit(8193).collect()]

out["probe_as_is"] = med(lambda: run_probe(False))
out["probe_coalesced"] = med(lambda: run_probe(True))
a = sorted(run_probe(False)); b = sorted(run_probe(True))
print("probe term sets identical:", a == b, "n_terms:", len(a))

# 3. full vs unique vs noprune (count action)
for name, kw in [
    ("full", {}),
    ("unique", {"unique_q_ids": True}),
    ("noprune", {"prune_terms": None}),
    ("noprune_unique", {"prune_terms": None, "unique_q_ids": True}),
]:
    out[name] = med(
        lambda kw=kw: search_bm25_df(
            docs, qdf_t, limit=10, postings=p, stats=st, **kw
        ).count(),
        reps=3,
    )

print(json.dumps(out, indent=1))
