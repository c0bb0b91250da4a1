"""Streaming sketch rollup: incremental HLL == batch answer.

The contract under test: after a finite stream drains, (a) the unioned
per-batch sketch states estimate within sketch error of the exact
distinct count, and (b) the pure streaming windowed approx-distinct
emits the same windows as its batch twin with in-bound estimates.
"""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.functions.sketches import hll_distinct
from lanterndb_spark.streaming.events import stream_events
from lanterndb_spark.streaming.sketches import (
    sketch_rollup_stream,
    windowed_distinct_users,
)

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


def test_incremental_sketch_store_matches_batch(spark, tables, tmp_path):
    store = str(tmp_path / "hll_store")
    write_batch, distinct_counts = sketch_rollup_stream("event_type", "user_id", store)

    stream = stream_events(spark, EVENTS_PATH)
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["event_type"]: r["n_distinct_est"]
        for r in distinct_counts(spark).collect()
    }
    ev = tables["events"]
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    batch_est = {
        r["event_type"]: r["n_distinct_est"]
        for r in hll_distinct(ev, "event_type", "user_id").collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert abs(got[et] - n) / n <= 0.05          # within sketch error of truth
        assert abs(got[et] - batch_est[et]) <= max(2, 0.02 * n)  # and of the batch path


def test_windowed_distinct_matches_batch_windows(spark, tables):
    stream = stream_events(spark, EVENTS_PATH)
    agg = windowed_distinct_users(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_distinct")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket_start"], r["event_type"]): r["n_distinct_est"]
        for r in spark.sql("SELECT * FROM win_distinct").collect()
    }
    exact = {
        (r["bucket_start"], r["event_type"]): r["n"]
        for r in (
            tables["events"]
            .groupBy(
                F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket_start"),
                "event_type",
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) / max(n, 1) <= 0.1
