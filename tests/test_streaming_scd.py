"""Streaming SCD2 must converge to the batch operator: after any prefix
of in-order batches the accumulated history equals scd2_history over the
union of the changes seen; out-of-order splices insert correctly."""

from datetime import datetime

from pyspark.sql import functions as F

from lanterndb_spark.operators.scd import scd2_history
from lanterndb_spark.streaming.scd import scd2_ingest_stream

SCHEMA = "uid int, ts timestamp, seq long, tier string"


def _t(d, h=0):
    return datetime(2024, 1, d, h)


def _hist_set(df):
    return {
        (r["uid"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_stream_equals_batch_in_order(spark):
    batches = [
        [(1, _t(1), 0, "bronze"), (2, _t(1), 1, "bronze")],
        [(1, _t(3), 2, "silver"), (2, _t(3), 3, "bronze")],   # uid2 no-op
        [(1, _t(5), 4, "gold"), (3, _t(5), 5, "bronze")],
    ]
    ingest = scd2_ingest_stream("uid", "ts", ["tier"], tiebreak_col="seq")
    write = ingest.writer()
    seen = []
    for i, b in enumerate(batches):
        seen += b
        write(spark.createDataFrame(b, SCHEMA), i)
        want = scd2_history(
            spark.createDataFrame(seen, SCHEMA), "uid", "ts", ["tier"],
            tiebreak_col="seq",
        )
        assert _hist_set(ingest.history) == _hist_set(want), f"after batch {i}"
    assert ingest.batches == 3
    cur = {r["uid"]: r["tier"] for r in ingest.current().collect()}
    assert cur == {1: "gold", 2: "bronze", 3: "bronze"}


def test_out_of_order_splice(spark):
    ingest = scd2_ingest_stream("uid", "ts", ["tier"], tiebreak_col="seq")
    write = ingest.writer()
    write(spark.createDataFrame(
        [(1, _t(1), 0, "bronze"), (1, _t(5), 1, "gold")], SCHEMA), 0)
    # late change lands BETWEEN the two existing versions
    write(spark.createDataFrame([(1, _t(3), 2, "silver")], SCHEMA), 1)
    rows = sorted(ingest.history.collect(), key=lambda r: r["valid_from"])
    assert [r["tier"] for r in rows] == ["bronze", "silver", "gold"]
    assert rows[0]["valid_to"] == _t(3) and rows[1]["valid_to"] == _t(5)
    assert rows[2]["is_current"]


def test_splice_remerges_equal_neighbors(spark):
    ingest = scd2_ingest_stream("uid", "ts", ["tier"], tiebreak_col="seq")
    write = ingest.writer()
    write(spark.createDataFrame(
        [(1, _t(1), 0, "bronze"), (1, _t(5), 1, "bronze")], SCHEMA), 0)
    # first batch already compressed the t5 no-op: one open version
    assert ingest.history.count() == 1
    # a late identical change must NOT split the interval either
    write(spark.createDataFrame([(1, _t(3), 2, "bronze")], SCHEMA), 1)
    rows = ingest.history.collect()
    assert len(rows) == 1 and rows[0]["valid_from"] == _t(1)
    assert rows[0]["is_current"]


def test_untouched_keys_pass_through(spark):
    ingest = scd2_ingest_stream("uid", "ts", ["tier"], tiebreak_col="seq")
    write = ingest.writer()
    write(spark.createDataFrame(
        [(1, _t(1), 0, "bronze"), (2, _t(1), 1, "gold")], SCHEMA), 0)
    before = {r for r in _hist_set(ingest.history) if r[0] == 2}
    write(spark.createDataFrame([(1, _t(2), 2, "silver")], SCHEMA), 1)
    after = {r for r in _hist_set(ingest.history) if r[0] == 2}
    assert before == after  # key 2 untouched by a batch that omits it


def test_foreachbatch_stream_run(spark, tmp_path):
    # end-to-end through a real Structured Streaming query. File-split
    # order is arbitrary (out-of-order delivery); with every change
    # point carrying a UNIQUE attr there are no compressible no-ops, so
    # the documented splice caveat cannot engage and FULL history
    # equality must hold whatever order the files arrive in.
    from datetime import timedelta

    base = datetime(2024, 1, 1)
    rows = [(i % 10, base + timedelta(minutes=i), i, f"v{i}")
            for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "scd_stream")
    df.repartition(4).write.mode("overwrite").parquet(src)

    ingest = scd2_ingest_stream("uid", "ts", ["tier"], tiebreak_col="seq")
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert ingest.batches >= 2
    want = scd2_history(df, "uid", "ts", ["tier"], tiebreak_col="seq")
    assert _hist_set(ingest.history) == _hist_set(want)
    assert ingest.current().count() == 10


def test_history_generations_released(spark):
    """Each batch swap frees the PREVIOUS generation's checkpoint blocks
    — a long-running stream must not accumulate one dead history RDD per
    micro-batch (DataFrame.unpersist is a no-op on checkpoints, so the
    writer uses CheckpointHandle).

    Tracks the SPECIFIC RDD ids each write creates (set diffs), not the
    global persistent count — under full-suite ordering the ContextCleaner
    and other modules' non-blocking unpersists race the global map (the
    r13 flake); our own ids are race-free (map removal is synchronous,
    RDD ids never reuse)."""

    def pids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    ingest = scd2_ingest_stream("uid", "ts", ["tier"], tiebreak_col="seq")
    write = ingest.writer()
    base = pids()
    write(spark.createDataFrame([(1, _t(1), 0, "bronze")], SCHEMA), 0)
    live = pids() - base  # generation 1's checkpoint blocks
    assert live
    for i in range(1, 4):
        pre = pids()
        write(spark.createDataFrame([(1, _t(i + 1), i, "gold")], SCHEMA), i)
        now = pids()
        assert not (live & now), f"batch {i} left the previous generation pinned"
        live = now - pre  # this batch's generation, freed by the next swap
        assert live
    assert ingest.batches == 4
