"""Resample/gap-fill: grid densification bounds, LOCF semantics, and the
per-key vs global grid distinction, on a hand-computable series."""

import datetime

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.timeseries import resample, time_bucket


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # user 1: observations at 00:05, 00:20, 03:10 → gaps at 01, 02
        (1, "2024-01-01 00:05:00", 10.0),
        (1, "2024-01-01 00:20:00", 30.0),
        (1, "2024-01-01 03:10:00", 50.0),
        # user 2: single observation → no gaps
        (2, "2024-01-01 02:30:00", 7.0),
    ]
    return spark.createDataFrame(rows, "user_id int, ts string, value double").select(
        "user_id", F.to_timestamp("ts").alias("ts"), "value"
    )


def test_time_bucket_floors(spark, series):
    got = series.select(time_bucket("ts", 3600).alias("b")).distinct().collect()
    hours = sorted(r["b"].replace(tzinfo=None) for r in got)
    assert hours == [
        datetime.datetime(2024, 1, 1, 0),
        datetime.datetime(2024, 1, 1, 2),
        datetime.datetime(2024, 1, 1, 3),
    ]


def test_resample_locf_fills_gaps(series):
    out = resample(
        series, "ts", "user_id", 3600,
        {"avg_value": F.avg("value"), "n": F.count("*")},
    ).orderBy("user_id", "__bucket").collect()
    u1 = [r for r in out if r["user_id"] == 1]
    # per-key grid: 00..03 inclusive = 4 buckets
    assert len(u1) == 4
    assert [r["__gap"] for r in u1] == [False, True, True, False]
    # hour 0 aggregates both observations; gap hours carry it forward
    assert u1[0]["avg_value"] == pytest.approx(20.0)
    assert u1[1]["avg_value"] == pytest.approx(20.0)
    assert u1[2]["avg_value"] == pytest.approx(20.0)
    assert u1[3]["avg_value"] == pytest.approx(50.0)
    # LOCF applies to every agg column, counts included
    assert [r["n"] for r in u1] == [2, 2, 2, 1]
    # single-observation key densifies to just itself
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and not u2[0]["__gap"]


def test_resample_raw_gaps(series):
    out = resample(
        series, "ts", "user_id", 3600, {"n": F.count("*")}, fill=None
    ).collect()
    gaps = [r for r in out if r["__gap"]]
    assert len(gaps) == 2
    assert all(r["n"] is None for r in gaps)


def test_resample_global_grid(series):
    out = resample(
        series, "ts", "user_id", 3600, {"n": F.count("*")}, grid="global"
    ).collect()
    # both keys span the table-wide 00..03 range
    assert len([r for r in out if r["user_id"] == 2]) == 4


def test_resample_rejects_unknown_fill(series):
    with pytest.raises(ValueError):
        resample(series, "ts", "user_id", 3600, {"n": F.count("*")}, fill="zero")


def test_resample_locf_total_and_dense(spark):
    """Randomized series: per-key grids are dense (every step between the
    key's min and max bucket present exactly once) and LOCF leaves no
    NULLs (the first bucket of every key is an observation)."""
    import random

    rng = random.Random(7)
    rows = []
    for user in range(12):
        t0 = rng.randrange(0, 50) * 3600
        for _ in range(rng.randrange(1, 8)):
            rows.append((user, t0 + rng.randrange(0, 72) * 737, float(rng.randrange(100))))
    df = spark.createDataFrame(rows, "user_id int, epoch long, value double").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts"), "value"
    )
    out = resample(df, "ts", "user_id", 3600, {"v": F.avg("value")}).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        buckets = sorted(int(r["__bucket"].timestamp()) for r in rs)
        assert len(set(buckets)) == len(buckets)
        assert buckets == list(range(buckets[0], buckets[-1] + 1, 3600))
        assert all(r["v"] is not None for r in rs)
        first = min(rs, key=lambda r: r["__bucket"])
        assert not first["__gap"]
