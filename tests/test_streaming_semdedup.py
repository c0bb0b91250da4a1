"""Streaming semantic dedup (streaming/semdedup.py): stream == batch.

Planted direction-preserving twins (cos_dist(v, 2v) = 0 against a
~0.49 natural pair floor) split across micro-batches in every
combination that matters: twin arrives after its source (cross-batch
pair), twin in the SAME batch (within-batch brute pair), and sources
with no twin (no false pairs). The accumulated pair set must equal the
batch operator ``embedding_near_dup_pairs(method='ann')`` over the
union — and here (twin degree 1 < k) that equals brute."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.dedup import embedding_near_dup_pairs
from lanterndb_spark.streaming.semdedup import semantic_dedup_ingest_stream


@pytest.fixture(scope="module")
def corpus(tables):
    emb = (
        tables["embeddings"].limit(90)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    twins = emb.filter(F.col("vec_id") < 60).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    return emb, twins


def _drive(spark, tmp_path, batches, **params):
    """Write each batch as one parquet file; maxFilesPerTrigger=1 turns
    them into successive micro-batches."""
    path = str(tmp_path / "semstream")
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(path)
    ingest = semantic_dedup_ingest_stream("vec_id", "embedding", **params)
    schema = batches[0].schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return ingest


def test_semdedup_stream_matches_batch(spark, tmp_path, corpus):
    emb, twins = corpus
    # batch 1: sources 0-59 and 20 twin-less rows; batch 2: twins of
    # 0-39 (cross-batch) + twins of 40-59 WITH their... twins of 40-59
    # arrive alone (cross); batch 3: nothing new near anything
    b1 = emb  # 90 source rows
    b2 = twins.filter(F.col("vec_id") < 100040)  # twins of 0-39 (cross)
    b3 = twins.filter(F.col("vec_id") >= 100040)  # twins of 40-59 (cross)
    ingest = _drive(spark, tmp_path, [b1, b2, b3], max_cos_dist=0.05,
                    index_params={"num_shards": 2})
    assert ingest.batches == 3
    got = {(r["id_a"], r["id_b"]) for r in ingest.all_pairs().collect()}
    union = emb.unionByName(twins)
    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            union, "vec_id", "embedding", max_cos_dist=0.05, method="brute"
        ).collect()
    }
    assert got == want
    assert len(want) == 60  # exactly the planted twins


def test_semdedup_stream_within_batch_pairs(spark, tmp_path, corpus):
    emb, twins = corpus
    # sources AND their twins in the SAME micro-batch: the within-batch
    # brute join must find them (the graph only holds EARLIER batches)
    b1 = emb.filter(F.col("vec_id") < 30)
    b2 = emb.filter(F.col("vec_id") >= 30).unionByName(twins)
    ingest = _drive(spark, tmp_path, [b1, b2], max_cos_dist=0.05,
                    index_params={"num_shards": 2})
    got = {(r["id_a"], r["id_b"]) for r in ingest.all_pairs().collect()}
    assert got == {(i, i + 100000) for i in range(60)}


def test_semdedup_stream_retry_and_regression_guards(spark, corpus):
    emb, twins = corpus
    ingest = semantic_dedup_ingest_stream(
        "vec_id", "embedding", max_cos_dist=0.05,
        index_params={"num_shards": 2},
    )
    write = ingest.writer()
    write(emb, 0)
    write(twins, 1)
    n = ingest.all_pairs().count()
    write(twins, 1)  # at-least-once retry: ignored
    assert ingest.all_pairs().count() == n == 60
    with pytest.raises(RuntimeError, match="regression"):
        write(emb, 0)
