"""SCD2 history builder: hand-computed versions, compression, snapshots."""

from datetime import datetime

from lanterndb_spark.operators.scd import scd2_history, scd2_snapshot


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k int, ts timestamp, seq int, color string, size int"
    )


def _t(d):
    return datetime(2024, 1, d)


def test_versions_and_intervals(spark):
    log = _log(
        spark,
        [
            (1, _t(1), 0, "red", 1),
            (1, _t(3), 1, "blue", 1),
            (1, _t(5), 2, "blue", 2),
        ],
    )
    hist = scd2_history(log, "k", "ts", ["color", "size"], tiebreak_col="seq")
    rows = sorted(hist.collect(), key=lambda r: r["valid_from"])
    assert [(r["color"], r["size"]) for r in rows] == [
        ("red", 1), ("blue", 1), ("blue", 2)
    ]
    assert rows[0]["valid_to"] == rows[1]["valid_from"] == _t(3)
    assert rows[1]["valid_to"] == rows[2]["valid_from"] == _t(5)
    assert rows[2]["valid_to"] is None and rows[2]["is_current"]
    assert not rows[0]["is_current"] and not rows[1]["is_current"]


def test_noop_changes_compressed(spark):
    log = _log(
        spark,
        [
            (1, _t(1), 0, "red", 1),
            (1, _t(2), 1, "red", 1),   # no-op: same attrs
            (1, _t(4), 2, "red", 2),
        ],
    )
    hist = scd2_history(log, "k", "ts", ["color", "size"], tiebreak_col="seq")
    rows = sorted(hist.collect(), key=lambda r: r["valid_from"])
    assert len(rows) == 2
    # the no-op row neither creates a version nor splits the interval
    assert rows[0]["valid_from"] == _t(1) and rows[0]["valid_to"] == _t(4)


def test_null_attrs_compress_null_safely(spark):
    log = _log(
        spark,
        [
            (1, _t(1), 0, None, 1),
            (1, _t(2), 1, None, 1),   # NULL == NULL for compression
            (1, _t(3), 2, "red", 1),
        ],
    )
    hist = scd2_history(log, "k", "ts", ["color", "size"], tiebreak_col="seq")
    assert hist.count() == 2


def test_independent_keys(spark):
    log = _log(
        spark,
        [
            (1, _t(1), 0, "red", 1),
            (2, _t(2), 1, "red", 1),
        ],
    )
    hist = scd2_history(log, "k", "ts", ["color"], tiebreak_col="seq")
    rows = hist.collect()
    assert len(rows) == 2 and all(r["is_current"] for r in rows)


def test_snapshot_point_in_time(spark):
    log = _log(
        spark,
        [
            (1, _t(1), 0, "red", 1),
            (1, _t(5), 1, "blue", 1),
            (2, _t(3), 2, "green", 1),
        ],
    )
    hist = scd2_history(log, "k", "ts", ["color"], tiebreak_col="seq")
    # day 4: key 1 is still red, key 2 is green
    snap = {r["k"]: r["color"]
            for r in scd2_snapshot(hist, "2024-01-04 00:00:00").collect()}
    assert snap == {1: "red", 2: "green"}
    # before any change for key 2
    snap2 = {r["k"]: r["color"]
             for r in scd2_snapshot(hist, "2024-01-02 00:00:00").collect()}
    assert snap2 == {1: "red"}
    # boundary: at the exact change instant the NEW version is valid
    snap3 = {r["k"]: r["color"]
             for r in scd2_snapshot(hist, "2024-01-05 00:00:00").collect()}
    assert snap3[1] == "blue"


def test_single_shuffle_plan(spark):
    log = _log(spark, [(1, _t(1), 0, "red", 1)])
    hist = scd2_history(log, "k", "ts", ["color"], tiebreak_col="seq")
    plan = hist._jdf.queryExecution().executedPlan().toString()
    # both windows ride one Exchange on the key
    assert plan.count("Exchange hashpartitioning") <= 1
