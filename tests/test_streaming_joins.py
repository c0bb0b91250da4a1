"""Stream-stream interval join: finite-input stream result must equal the
batch twin (the engine's standard streaming oracle pattern)."""

from pyspark.sql import functions as F

from lanterndb_spark.streaming.events import stream_events
from lanterndb_spark.streaming.joins import batch_interval_join, stream_interval_join

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


def _clicks(df):
    return df.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")


def _purchases(df):
    return df.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")


def _key_set(rows):
    return {
        (r["user_id"], r["l_event_id"], r["r_ts"], round(r["r_value"], 6))
        for r in rows
    }


def test_stream_interval_join_converges_to_batch(spark, tables):
    s = stream_events(spark, EVENTS_PATH)
    joined = stream_interval_join(
        _clicks(s), _purchases(s), key="user_id", window="1 hour", watermark="4 hours"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _key_set(spark.sql("SELECT * FROM ssj").collect())

    ev = tables["events"]
    want = _key_set(
        batch_interval_join(
            _clicks(ev), _purchases(ev), key="user_id", window="1 hour"
        ).collect()
    )
    assert got == want and want  # non-trivial join


def test_batch_interval_join_matches_range_join_semantics(tables):
    """The batch twin must agree with the bucketed range_join on the same
    predicate (two independent plans, one answer)."""
    from lanterndb_spark.operators.temporal import range_join

    ev = tables["events"]
    clicks = _clicks(ev)
    intervals = clicks.select(
        "user_id",
        F.col("event_id").alias("cid"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    points = _purchases(ev)
    via_range = range_join(
        points, intervals, point_col="ts", lo_col="lo", hi_col="hi", by="user_id"
    )
    a = {
        (r["user_id"], r["cid"], r["ts"], round(r["value"], 6))
        for r in via_range.select("user_id", "cid", "ts", "value").collect()
    }
    b = {
        (r["user_id"], r["l_event_id"], r["r_ts"], round(r["r_value"], 6))
        for r in batch_interval_join(
            clicks, points, key="user_id", window="1 hour"
        ).collect()
    }
    assert a == b and a
