"""Micro-time bm25df's driver-side pre-passes on an idle machine.

Isolates (a) the `_postings_worth_probe` stats read, (b) the
`_has_duplicate_qids` job on a 64-row LocalRelation, (c) the four
search_bm25_df variants at reps=7, interleaved round-robin so drift
hits every variant equally. Read-only diagnosis tool.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from lanterndb_spark.session import get_spark, load_tables  # noqa: E402

spark = get_spark(app_name="bm25df-gate-r14")
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, os.environ["SPARK_GRAFT_SF_DIR"])
docs = t["documents"]
docs.cache().count()

from lanterndb_spark.operators.bm25 import (  # noqa: E402
    _postings_worth_probe, build_postings, corpus_stats, search_bm25_df,
)
from lanterndb_spark.operators.hnsw import _has_duplicate_qids  # noqa: E402

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

# (a) gate, 20 reps after one warm call
_postings_worth_probe(p)
g = []
for _ in range(20):
    t0 = time.monotonic()
    _postings_worth_probe(p)
    g.append(time.monotonic() - t0)
print("gate_s:", round(statistics.median(g), 4), [round(x, 4) for x in g[:8]])

# (b) dup-check, 10 reps after warm
_has_duplicate_qids(qdf_t, "q_id")
d = []
for _ in range(10):
    t0 = time.monotonic()
    _has_duplicate_qids(qdf_t, "q_id")
    d.append(time.monotonic() - t0)
print("dupcheck_s:", round(statistics.median(d), 4), [round(x, 4) for x in d])

# (c) variants interleaved, reps=7
variants = {
    "full": {},
    "unique": {"unique_q_ids": True},
    "noprune": {"prune_terms": None},
    "noprune_unique": {"prune_terms": None, "unique_q_ids": True},
}
samples: dict[str, list[float]] = {k: [] for k in variants}
for k, kw in variants.items():  # warm each once
    search_bm25_df(docs, qdf_t, limit=10, postings=p, stats=st, **kw).count()
for _ in range(7):
    for k, kw in variants.items():
        t0 = time.monotonic()
        search_bm25_df(docs, qdf_t, limit=10, postings=p, stats=st, **kw).count()
        samples[k].append(time.monotonic() - t0)
out = {
    k: (round(statistics.median(v), 4), [round(x, 4) for x in v])
    for k, v in samples.items()
}
print(json.dumps(out, indent=1))
