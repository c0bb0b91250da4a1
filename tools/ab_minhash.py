"""A/B: MinHash signature kernel — Catalyst hash-min aggregation vs a
per-partition numpy mapInPandas kernel (VERDICT r7/r8 queue item).

The shipped path (`operators/dedup._minhash_wide`) computes signatures as
explode + 64 codegen'd `min(xorshift(h1 + i*h2))` aggregates with map-side
partial agg. The hypothesis under test: a vectorized python kernel
(tokenize in pandas str ops, shingle, per-shingle C-speed hash, one
(M, 64) uint64 mix + segmented min per Arrow batch) could beat the JVM
aggregation by skipping the explode shuffle entirely (signatures are
computed doc-local, zero shuffle rows vs one row per (doc, shingle)).

Run:  python tools/ab_minhash.py [n_docs ...]
Writes spark-warehouse/ab_minhash_r9.json and prints one JSON line.
Result is recorded either way (keep-only-if-faster rule); the kernel is
NOT shipped unless it wins at both bench scale and 500k.
"""
from __future__ import annotations

import json
import os
import sys
import time
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lanterndb_spark.operators.dedup import minhash_signatures  # noqa: E402
from lanterndb_spark.session import get_spark  # noqa: E402


def numpy_signatures(df, id_col, text_col, num_hashes=64, n=3):
    """mapInPandas twin of minhash_signatures: same tokenizer contract
    (tokenize_py's [\\W_]+ split), same n-gram shingles, same KM + xorshift
    mix shape — a different (crc32-based) base hash family, which is fine
    for an A/B: minhash only needs a pseudo-independent family, and the
    cost profile is what's being measured."""
    H = num_hashes
    idx = np.arange(H, dtype=np.uint64)

    def kern(batches):
        for pdf in batches:
            toks_col = (
                pdf[text_col].str.lower().str.replace(r"[\W_]+", " ", regex=True).str.split()
            )
            ids, h1s, h2s, counts = [], [], [], []
            for did, toks in zip(pdf[id_col], toks_col):
                toks = toks or []
                m = len(toks) - n + 1
                if m <= 0:
                    continue
                sh = [" ".join(toks[i : i + n]).encode() for i in range(m)]
                ids.append(did)
                counts.append(m)
                h1s.extend(zlib.crc32(s) for s in sh)
                h2s.extend(zlib.crc32(s, 0x9747B28C) for s in sh)
            if not ids:
                continue
            a1 = np.asarray(h1s, dtype=np.uint64)
            a2 = np.asarray(h2s, dtype=np.uint64)
            v = a1[:, None] + idx[None, :] * a2[:, None]  # (M, H)
            v ^= v << np.uint64(13)
            v ^= v >> np.uint64(7)
            v ^= v << np.uint64(17)
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            mins = np.minimum.reduceat(v, offs, axis=0).view(np.int64)
            yield pd.DataFrame(
                {"id": ids, "sig": [row.tolist() for row in mins]}
            )

    return df.select(F.col(id_col).alias(id_col), text_col).mapInPandas(
        kern, "id bigint, sig array<bigint>"
    )


def drain(sig_df):
    # bit_xor: forces full evaluation without ANSI-mode sum overflow
    return sig_df.selectExpr("count(*) c", "bit_xor(sig[0]) s").collect()[0]["c"]


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main():
    spark = get_spark(app_name="ab-minhash", shuffle_partitions=32)
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 100_000, 500_000]
    out = {"num_hashes": 64, "n": 3, "reps_best_of": 3, "sizes": {}}
    sf_docs = spark.read.parquet(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        + "/documents.parquet"
    )
    cases = [("sf0.1", sf_docs)]
    from tools.scale_smoke import gen

    for nd in sizes:
        if nd <= 10_000:
            continue
        _, docs = gen(spark, 1000, nd)
        cases.append((f"synth_{nd}", docs))
    for label, docs in cases:
        docs = docs.persist()
        ndocs = docs.count()
        cat = timed(lambda: drain(minhash_signatures(docs, "doc_id", "text")))
        np_t = timed(lambda: drain(numpy_signatures(docs, "doc_id", "text")))
        out["sizes"][label] = {
            "docs": ndocs, "catalyst_s": cat, "numpy_kernel_s": np_t,
            "winner": "catalyst" if cat <= np_t else "numpy",
        }
        docs.unpersist()
    os.makedirs("spark-warehouse", exist_ok=True)
    with open("spark-warehouse/ab_minhash_r9.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
