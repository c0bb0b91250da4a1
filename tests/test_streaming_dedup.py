"""Streaming dedup: finite-input streams must agree with batch
``exact_dedup`` (same content key), and the stateful first-seen tagger
must keep every row while flagging later copies."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.dedup import exact_dedup
from lanterndb_spark.streaming.dedup import content_key, dedup_stream, first_seen_stream

DOCS_PATH = "/root/testdata/sf0.001/documents.parquet"
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _stream_docs(spark):
    base, fname = DOCS_PATH.rsplit("/", 1)
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", fname)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )


def test_dedup_stream_matches_batch(spark, tables):
    stream = _stream_docs(spark).withColumn("ck", content_key("text"))
    out = dedup_stream(stream, "ck")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT ck, doc_id FROM dedup_out").collect()

    batch = tables["documents"].withColumn("ck", content_key("text"))
    want_keys = {r["ck"] for r in batch.select("ck").distinct().collect()}
    # one survivor per content key; keys identical to batch distinct set
    assert len(got) == len(want_keys)
    assert {r["ck"] for r in got} == want_keys


def test_dedup_stream_watermarked(spark):
    stream = _stream_docs(spark).withColumn("ck", content_key("text")).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    out = dedup_stream(stream, "ck", time_col="ingest_ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT ck FROM dedup_wm").collect()
    assert len(rows) == len({r["ck"] for r in rows})  # no dupes within horizon


def test_dedup_stream_watermark_requires_time_col(spark):
    with pytest.raises(ValueError):
        dedup_stream(_stream_docs(spark), "ck", watermark="1 hour")


def test_first_seen_stream_matches_batch_keep_min(spark, tables):
    stream = _stream_docs(spark).withColumn("ck", content_key("text"))
    tagged = first_seen_stream(stream, "ck", "doc_id")
    q = (
        tagged.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM first_seen").collect()

    docs = tables["documents"].withColumn("ck", content_key("text"))
    keepers = {
        r["doc_id"] for r in exact_dedup(docs, "ck", "doc_id", keep="min").collect()
    }
    # every input row comes back exactly once, tagged
    assert len(got) == docs.count()
    got_keepers = {r["doc_id"] for r in got if not r["is_duplicate"]}
    # single-batch finite input reproduces batch keep="min" exactly
    assert got_keepers == keepers
    # all copies of a key except the keeper are flagged
    dupes = {r["doc_id"] for r in got if r["is_duplicate"]}
    assert dupes.isdisjoint(keepers)
    assert len(dupes) + len(keepers) == len(got)
