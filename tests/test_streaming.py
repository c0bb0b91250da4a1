import time

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.streaming.events import (
    incremental_postings_stream,
    stream_events,
    windowed_event_counts,
)

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


def test_windowed_counts_converge_to_batch(spark, tables):
    stream = stream_events(spark, EVENTS_PATH)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = {
        (r["bucket_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in tables["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp("w.start").alias("bucket_start"),
            "event_type", "n", "sum_value",
        )
        .collect()
    }
    assert got == batch


def test_incremental_postings_matches_batch(spark, tables):
    docs = tables["documents"].limit(100)
    # drive foreachBatch manually with two half-batches (same contract)
    write_batch, consolidate, state = incremental_postings_stream(docs)
    write_batch(docs.filter(F.col("doc_id") < 50), 0)
    write_batch(docs.filter(F.col("doc_id") >= 50), 1)
    merged = {r["term"]: r for r in consolidate().collect()}

    from lanterndb_spark.operators.bm25 import build_postings

    full = {r["term"]: r for r in build_postings(docs).collect()}
    assert set(merged) == set(full)
    for t in full:
        assert merged[t]["doc_ids"] == full[t]["doc_ids"]
        assert merged[t]["fqs"] == full[t]["fqs"]
        assert merged[t]["term_freq"] == full[t]["term_freq"]
