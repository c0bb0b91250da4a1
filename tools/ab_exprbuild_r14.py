"""Interleaved A/B: SQL-parsed vs Column-DSL expression construction for
minhash/simhash (r14 "py4j chatter" optimization, guide §5/§7.3).

Loads the pre-change implementation (parent of the optimizing commit, or
HEAD when run uncommitted) as a standalone module and alternates arms in
ONE session so clock/JIT drift hits both equally. Asserts row identity on
every arm pair before timing. Writes spark-warehouse/ab_exprbuild_r14.json.

Usage: python tools/ab_exprbuild_r14.py [OLD_REV] [SF_DIR]
"""
import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lanterndb_spark.session import get_spark, load_tables  # noqa: E402
from lanterndb_spark.plans.shape import release  # noqa: E402

OLD_REV = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

old_src = subprocess.run(
    ["git", "-C", REPO, "show", f"{OLD_REV}:lanterndb_spark/operators/dedup.py"],
    capture_output=True, text=True, check=True,
).stdout
os.makedirs("/tmp/ab_exprbuild_old", exist_ok=True)
old_path = "/tmp/ab_exprbuild_old/dedup_old.py"
with open(old_path, "w") as fh:
    fh.write(old_src)
spec = importlib.util.spec_from_file_location("dedup_old", old_path)
old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old)

import lanterndb_spark.operators.dedup as new  # noqa: E402

spark = get_spark()
sc = spark.sparkContext
t = load_tables(spark, SF_DIR)
docs = t["documents"]
docs.cache().count()
load1 = os.getloadavg()[0]


def run_minhash(mod):
    out = mod.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
    )
    rows = sorted(tuple(r) for r in out.collect())
    release(out)
    return rows


def run_simhash(mod):
    out = mod.simhash_pairs(docs, "doc_id", "text", max_hamming=10)
    rows = sorted(tuple(r) for r in out.collect())
    release(out)
    return rows


def ab(fn, pairs):
    olds, news = [], []
    for i in range(pairs):
        sc.setJobDescription(f"{fn.__name__}_old#{i}")
        t0 = time.monotonic()
        ra = fn(old)
        olds.append(round(time.monotonic() - t0, 3))
        sc.setJobDescription(f"{fn.__name__}_new#{i}")
        t0 = time.monotonic()
        rb = fn(new)
        news.append(round(time.monotonic() - t0, 3))
        assert ra == rb, f"{fn.__name__}: arm outputs differ on pair {i}"
    deltas = sorted(o - n for o, n in zip(olds, news))
    return {
        "old_s": olds,
        "new_s": news,
        "old_median": statistics.median(olds),
        "new_median": statistics.median(news),
        "paired_delta_median_s": round(statistics.median(deltas), 3),
        "rows_identical": True,
    }


def construct_only(pairs=6):
    olds, news = [], []
    for _ in range(pairs):
        t0 = time.monotonic()
        old.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64,
                              bands=16, threshold=0.5, verify=False)
        olds.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        new.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64,
                              bands=16, threshold=0.5, verify=False)
        news.append(round(time.monotonic() - t0, 3))
    return {
        "old_s": olds, "new_s": news,
        "old_median": statistics.median(olds),
        "new_median": statistics.median(news),
    }


result = {
    "what": "interleaved same-session A/B, old (Column-DSL loops) vs new "
            "(SQL-parsed expression construction) dedup.py; rows asserted "
            "identical on every pair before timing counts",
    "old_rev": OLD_REV,
    "sf_dir": SF_DIR,
    "conditions": {"load_1m_at_start": load1, "cpus": os.cpu_count()},
    "construct_only_minhash_verifyFalse": construct_only(),
    "minhash_full": ab(run_minhash, 6),
    "simhash_full": ab(run_simhash, 4),
}
out_path = os.path.join(REPO, "spark-warehouse", "ab_exprbuild_r14.json")
with open(out_path, "w") as fh:
    json.dump(result, fh, indent=1)
print(json.dumps(result, indent=1))
