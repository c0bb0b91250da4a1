"""Streaming PSI drift monitor: frozen reference buckets, per-batch
readings matching the batch operator, alarm on shifted batches."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.profile import psi_drift
from lanterndb_spark.streaming.drift import drift_monitor_stream


def test_batch_readings_match_batch_operator(spark):
    ref = spark.createDataFrame([(float(i % 50),) for i in range(500)], "x double")
    same = spark.createDataFrame([(float(i % 50),) for i in range(300)], "x double")
    shifted = spark.createDataFrame(
        [(float(i % 50 + 40),) for i in range(300)], "x double"
    )

    mon = drift_monitor_stream(ref, "x", bins=10, threshold=0.25)
    write = mon.writer()
    write(same, 0)
    write(shifted, 1)

    assert len(mon.readings) == 2
    assert not mon.readings[0]["drifted"]
    assert mon.readings[1]["drifted"]
    assert mon.drifted_batches() == [1]

    # reading 0 equals the batch operator at the SAME frozen bounds
    want = psi_drift(ref, same, "x", bins=10, lo=mon.lo, hi=mon.hi)
    want_psi = round(float(want.agg(F.sum("contrib").alias("s")).first()["s"]), 6)
    assert mon.readings[0]["psi"] == want_psi


def test_bounds_frozen_from_reference(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    mon = drift_monitor_stream(ref, "x", bins=5)
    assert (mon.lo, mon.hi) == (0.0, 99.0)
    # a batch far outside the reference range clamps into the edge
    # buckets instead of re-normalizing the layout
    far = spark.createDataFrame([(1e6,)] * 50, "x double")
    mon.writer()(far, 0)
    assert mon.readings[0]["drifted"]


def test_foreachbatch_stream_run(spark, tmp_path):
    ref = spark.createDataFrame([(float(i % 20),) for i in range(400)], "x double")
    stream_data = spark.createDataFrame(
        [(float(i % 20),) for i in range(200)], "x double"
    )
    src = str(tmp_path / "drift_stream")
    stream_data.repartition(2).write.mode("overwrite").parquet(src)

    mon = drift_monitor_stream(ref, "x", bins=10)
    q = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(mon.readings) >= 2
    # same-distribution batches never alarm
    assert mon.drifted_batches() == []
