"""Streaming near-dup ingest must converge to the batch operator: the
union of per-batch pair emissions equals the full-corpus estimate-mode
run, with each pair emitted exactly once (when its later doc arrives)."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.dedup import minhash_lsh_pairs
from lanterndb_spark.streaming.neardup import near_dup_ingest_stream

DOCS_PATH = "/root/testdata/sf0.001/documents.parquet"
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_stream_converges_to_batch(spark, tmp_path, tables):
    docs = tables["documents"].select("doc_id", "text")
    # plant twins across batch boundaries so cross-batch pairs exist
    twins = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)
    src = str(tmp_path / "docs_stream")
    corpus.repartition(3).write.mode("overwrite").parquet(src)

    ingest = near_dup_ingest_stream("doc_id", "text", threshold=0.5, max_bucket=None)
    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert ingest.batches == 3

    got = {
        frozenset((r["id_a"], r["id_b"]))
        for r in ingest.all_pairs().collect()
    }
    want = {
        frozenset((r["id_a"], r["id_b"]))
        for r in minhash_lsh_pairs(
            corpus, "doc_id", "text", threshold=0.5,
            verify="estimate", max_bucket=None,
        ).collect()
    }
    assert got == want and len(got) >= twins.count()
    # exactly-once emission: no pair appears twice across batches
    assert ingest.all_pairs().count() == len(got)


def test_seeded_store(spark, tables):
    from lanterndb_spark.operators.dedup import minhash_signatures

    docs = tables["documents"].select("doc_id", "text").limit(100)
    sigs = minhash_signatures(docs, "doc_id", "text")
    ingest = near_dup_ingest_stream("doc_id", "text", threshold=0.9, corpus_sigs=sigs)
    twin = docs.limit(1).select((F.col("doc_id") + 500_000).alias("doc_id"), "text")
    ingest.writer()(twin, 0)
    pairs = ingest.all_pairs().collect()
    assert any(r["jaccard"] == pytest.approx(1.0) for r in pairs)
