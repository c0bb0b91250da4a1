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


def test_late_events_beyond_watermark_drop(spark, tmp_path):
    """Pins the DROP side of the watermark contract (the convergence test
    above only sees on-time data). Spark's guarantee is eviction-based:
    a straggler is excluded once the watermark has strictly passed its
    window's end AND the window's state has been evicted in an EARLIER
    batch — a late row landing in the same batch as the eviction can
    still squeak in (measured; that's within Spark's contract, which
    promises dropping only "too late" data). So: batch 1 advances the
    watermark past the 10:00 window, batch 2 triggers the eviction, and
    batch 3's 10:20 straggler must then be dropped — the emitted window
    stays at the 2 on-time rows and is never re-emitted."""
    import datetime
    import time as _time

    src = str(tmp_path / "late_stream")
    ts = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)
    S = "event_id long, event_type string, ts timestamp, value double"
    b1 = [(1, "click", ts(10, 5), 1.0), (2, "click", ts(10, 10), 1.0),
          (3, "click", ts(12, 1), 1.0)]   # watermark after batch 1: 11:01
    b2 = [(4, "click", ts(12, 2), 1.0)]   # eviction batch for [10:00,11:00)
    b3 = [(5, "click", ts(10, 20), 1.0),  # straggler behind evicted state
          (6, "click", ts(12, 30), 1.0)]
    for rows in (b1, b2, b3):
        spark.createDataFrame(rows, S).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes: file source processes oldest first

    stream = spark.readStream.schema(S).option("maxFilesPerTrigger", 1).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")      # append: only watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_drop").collect()
    # exactly one closed window (10:00) emitted exactly once, straggler
    # excluded; the 12:00 window never closed so it never appears
    assert [(r["n"], r["sum_value"]) for r in rows] == [(2, 2.0)], rows
