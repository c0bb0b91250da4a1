#!/usr/bin/env python
"""End-to-end training-data pipeline demo over the engine's operators.

Runs the canonical curation flow a reference user would assemble, stage
by stage, printing row counts and wall-clock per stage:

    raw corpus
      → PII scrub                         (functions/pii.py)
      → repeated-span boilerplate cut     (operators/spans.py)
      → quality classifier filter         (operators/classifier.py)
      → document near-dup removal         (operators/dedup.py, MinHash-LSH
                                           + components, keep min id)
      → benchmark decontamination         (operators/contamination.py)
      → temperature-scaled domain mix     (operators/sampling.py)
      → leakage-safe train/val/test split (operators/sampling.py)
      → sequence packing                  (operators/packing.py)
      → sharded export                    (sources/sized.py)

Usage::

    python tools/pipeline_demo.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.01, out_dir=a temp dir. Every stage
is the library call a user would write — nothing here is demo-only code.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark, load_tables


def stage(name, fn):
    """Run a stage and TRUNCATE ITS LINEAGE (eager localCheckpoint).

    This is the load-bearing line of the demo: chaining nine operators —
    one of which (connected components) is iterative — multiplies the
    logical plan at every step; un-truncated, the mix stage ran 156s on
    266 rows and the split stage OOMed the driver while merely PRINTING
    its plan tree. Materializing each stage and cutting lineage keeps
    every downstream plan stage-sized. On a cluster, the equivalent is
    writing stage outputs to parquet (which also gets column pruning
    back); localCheckpoint is the in-session shortcut."""
    t0 = time.monotonic()
    out = fn()
    if hasattr(out, "localCheckpoint"):
        out = out.localCheckpoint(eager=True)
        n = out.count()
    else:
        n = out
    print(f"  {name:<38} {n:>8} rows  {time.monotonic() - t0:6.2f}s")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipe_")
    spark = get_spark(app_name="pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    print(f"pipeline over {sf_dir} -> {out_dir}")
    print(f"  {'raw corpus':<38} {docs.count():>8} rows")

    # 1. PII scrub (pure projection)
    from lanterndb_spark.functions.pii import scrub

    clean = stage("pii_scrub", lambda: scrub(docs).withColumn(
        "text", F.col("text_clean")).drop("text_clean", "has_pii"))

    # 2. repeated-span boilerplate cut (first-occurrence keep is the
    #    streaming variant; batch masks every carrier)
    from lanterndb_spark.operators.spans import mask_repeated_spans

    cut = stage("span_dedup (10-token, >=2 docs)", lambda: (
        mask_repeated_spans(clean, "doc_id", "text", min_len=10, min_docs=2)
        .withColumn("text", F.col("text_deduped"))
        .drop("text_deduped")
    ))

    # 3. trained quality filter: label = long-doc proxy, score, keep p>=0.3
    from lanterndb_spark.operators.classifier import quality_classifier

    med = cut.approxQuantile("n_chars", [0.5], 0.0)[0]
    lab = cut.withColumn("y", (F.col("n_chars") > F.lit(med)).cast("int"))
    scored, model = quality_classifier(lab, "text", "y")
    kept = stage("quality_filter (p >= 0.3)", lambda: scored.filter(
        F.col("quality_prob") >= 0.3).drop("y"))

    # 4. document-level near-dup removal (MinHash-LSH -> components ->
    #    keep the min id of every duplicate group)
    from lanterndb_spark.operators.dedup import (
        dedup_keep_representatives, minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(kept, "doc_id", "text", threshold=0.7).localCheckpoint()
    uniq = stage("near_dup_removal (J >= 0.7)", lambda: (
        dedup_keep_representatives(kept, pairs, "doc_id")))

    # 5. benchmark decontamination (first 20 docs stand in for an eval set)
    from lanterndb_spark.operators.contamination import decontaminate

    bench = docs.orderBy("doc_id").limit(20).select("text")
    flags = decontaminate(uniq, bench, n=5)
    decon = stage("decontaminate (5-gram overlap)", lambda: uniq.join(
        flags.filter(~F.col("contaminated")).select("doc_id"),
        "doc_id", "left_semi"))

    # 6. temperature-scaled language mix
    from lanterndb_spark.operators.sampling import mix_to_weights, temperature_weights

    mixed = stage("mix_domains (tau=0.5 over lang)", lambda: mix_to_weights(
        decon, "lang", temperature_weights(decon, "lang", 0.5), "doc_id"))

    # 7. leakage-safe split (near-dup components stay on one side)
    from lanterndb_spark.operators.sampling import leakage_safe_split

    split = stage("leakage_safe_split 90/5/5", lambda: leakage_safe_split(
        mixed, "doc_id", pairs.select("id_a", "id_b"),
        {"train": 0.9, "val": 0.05, "test": 0.05}))

    # 8. pack train docs into 512-token sequences
    from lanterndb_spark.operators.packing import pack_contiguous

    packed = stage("pack_sequences (512 tokens)", lambda: pack_contiguous(
        split.filter(F.col("split") == "train"), budget=512))

    # 9. sharded export
    from lanterndb_spark.sources.sized import write_sized_parquet

    t0 = time.monotonic()
    receipt = write_sized_parquet(
        packed, os.path.join(out_dir, "train"), target_mb=8
    )
    n_files = receipt["n_files"]
    print(f"  {'export (sized parquet)':<38} {n_files:>8} files {time.monotonic() - t0:6.2f}s")
    print("done.")


if __name__ == "__main__":
    main()
