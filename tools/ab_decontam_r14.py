#!/usr/bin/env python
"""Interleaved within-session A/B of the r14 decontaminate fusion:
old shape (two corpus tokenize passes + corpus-side join) vs new shape
(one explode_outer pass, group on (id, n_grams)). Alternating arms, one
Spark session, paired deltas — the box's ambient noise cancels per pair.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lanterndb_spark.operators.contamination import (
    _norm_grams, decontaminate, eval_ngrams,
)
from lanterndb_spark.session import get_spark, load_tables


def old_decontaminate(docs, eval_df, n=5, id_col="doc_id", text_col="text",
                      min_hits=1):
    """The pre-r14 shape, verbatim."""
    grams = eval_ngrams(eval_df, text_col, n)
    doc_grams = docs.select(
        F.col(id_col), _norm_grams(F.col(text_col), n).alias("__grams")
    )
    hits = (
        doc_grams.select(id_col, F.explode("__grams").alias("gram"))
        .join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("hits"))
    )
    base = doc_grams.select(
        id_col, F.size("__grams").cast("int").alias("n_grams")
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("hits", F.lit(0)).cast("int").alias("hits"),
            (F.coalesce("hits", F.lit(0)) >= F.lit(int(min_hits))).alias(
                "contaminated"
            ),
        )
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-decontam-r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    docs.cache().count()
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    corpus = docs.filter(F.col("doc_id") % 19 != 0)

    def run(fn) -> float:
        t0 = time.monotonic()
        fn(corpus, bench, n=5).filter("contaminated").count()
        return time.monotonic() - t0

    # equivalence first: identical rows from both shapes
    old_rows = sorted(map(tuple, old_decontaminate(corpus, bench, n=5).collect()))
    new_rows = sorted(map(tuple, decontaminate(corpus, bench, n=5).collect()))
    assert old_rows == new_rows, "shapes disagree"

    pairs = []
    for i in range(6):
        if i % 2 == 0:
            o, n_ = run(old_decontaminate), run(decontaminate)
        else:
            n_, o = run(decontaminate), run(old_decontaminate)
        pairs.append({"old": round(o, 3), "new": round(n_, 3)})

    deltas = sorted(p["old"] - p["new"] for p in pairs)
    out = {
        "what": "decontaminate r14 fusion A/B, interleaved in-session, sf0.1",
        "rows_equal": True,
        "pairs": pairs,
        "paired_delta_median_s": round(deltas[len(deltas) // 2], 3),
        "load_1m": os.getloadavg()[0],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
