"""As-of and range joins: brute-force equivalence on random data,
semantics edges (equality, tolerance, directions, unmatched lefts),
and plan shape (no nested-loop join in range_join)."""

import random

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.temporal import asof_join, overlap_join, range_join


def _brute_asof(left, right, direction, tolerance=None):
    """left/right: list of (key, t, payload). Returns {(key, t, payload_l): matched_t}."""
    out = {}
    for lk, lt, lid in left:
        cands = [(rk, rt, rid) for rk, rt, rid in right if rk == lk]
        if direction == "backward":
            cands = [c for c in cands if c[1] <= lt]
            best = max(cands, key=lambda c: (c[1], c[2]), default=None)
        elif direction == "forward":
            cands = [c for c in cands if c[1] >= lt]
            best = min(cands, key=lambda c: (c[1], -c[2]), default=None)
        else:  # nearest, backward wins ties
            best = None
            for c in cands:
                if best is None:
                    best = c
                    continue
                d_c, d_b = abs(c[1] - lt), abs(best[1] - lt)
                back_c, back_b = c[1] <= lt, best[1] <= lt
                if (d_c, not back_c, -c[2]) < (d_b, not back_b, -best[2]):
                    best = c
        if best is not None and tolerance is not None and abs(best[1] - lt) > tolerance:
            best = None
        out[(lk, lt, lid)] = best[1] if best else None
    return out


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_bruteforce(spark, direction):
    rng = random.Random(42 + len(direction))
    left = [(rng.randrange(4), float(rng.randrange(50)), i) for i in range(120)]
    right = [(rng.randrange(4), float(rng.randrange(50)), 1000 + i) for i in range(80)]
    # duplicate timestamps within a key are present by construction (range 50)
    ldf = spark.createDataFrame(left, "k long, t double, lid long")
    rdf = spark.createDataFrame(right, "k long, t double, rid long")
    got = asof_join(ldf, rdf, on="t", by="k", direction=direction).collect()
    want = _brute_asof(left, right, direction)
    assert len(got) == len(left)
    for r in got:
        assert r["t_right"] == want[(r["k"], r["t"], r["lid"])], (direction, r)


def test_asof_tolerance_and_unmatched(spark):
    ldf = spark.createDataFrame([(1, 10.0, 1), (1, 100.0, 2), (2, 5.0, 3)],
                                "k long, t double, lid long")
    rdf = spark.createDataFrame([(1, 8.0, 7), (1, 50.0, 8)],
                                "k long, t double, rid long")
    rows = {r["lid"]: r for r in asof_join(ldf, rdf, on="t", by="k",
                                           tolerance=10.0).collect()}
    assert rows[1]["rid"] == 7                  # within 10s
    assert rows[2]["rid"] is None               # nearest-before is 50s away
    assert rows[3]["rid"] is None               # key 2 has no rights at all
    assert len(rows) == 3


def test_asof_equal_timestamp_inclusive(spark):
    ldf = spark.createDataFrame([(1, 10.0, 1)], "k long, t double, lid long")
    rdf = spark.createDataFrame([(1, 10.0, 7)], "k long, t double, rid long")
    for direction in ("backward", "forward", "nearest"):
        got = asof_join(ldf, rdf, on="t", by="k", direction=direction).first()
        assert got["rid"] == 7, direction


def test_asof_duplicate_right_ts_deterministic(spark):
    # two rights at the same maximal ts: largest payload tuple wins
    ldf = spark.createDataFrame([(1, 10.0, 1)], "k long, t double, lid long")
    rdf = spark.createDataFrame([(1, 9.0, 3), (1, 9.0, 9)],
                                "k long, t double, rid long")
    assert asof_join(ldf, rdf, on="t", by="k").first()["rid"] == 9


def test_asof_timestamps_and_collision_suffix(tables):
    ev = tables["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts", "user_id", "value")
    buys = ev.filter(F.col("event_type") == "purchase").select("ts", "user_id", "value")
    out = asof_join(clicks, buys, on="ts", by="user_id", tolerance=3600.0)
    assert set(out.columns) == {"event_id", "ts", "user_id", "value", "ts_right", "value_right"}
    rows = out.collect()
    assert len(rows) == clicks.count()
    for r in rows:
        if r["ts_right"] is not None:
            gap = (r["ts"] - r["ts_right"]).total_seconds()
            assert 0 <= gap <= 3600.0


def test_range_join_matches_bruteforce_and_plan(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(3), float(rng.randrange(1000)), i) for i in range(150)]
    ivs = []
    for i in range(40):
        lo = float(rng.randrange(1000))
        ivs.append((rng.randrange(3), lo, lo + rng.randrange(1, 120), 500 + i))
    pdf = spark.createDataFrame(pts, "k long, p double, pid long")
    idf = spark.createDataFrame(ivs, "k long, lo double, hi double, ivid long")

    for by, bucket in [("k", None), (None, 50.0)]:
        out = range_join(pdf, idf, "p", "lo", "hi", by=by)
        want = {(p[2], v[3]) for p in pts for v in ivs
                if (by is None or p[0] == v[0]) and v[1] <= p[1] <= v[2]}
        got = {(r["pid"], r["ivid"]) for r in out.collect()}
        assert got == want, by
        assert len(got) == out.count()  # no duplicate pairs
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_overlap_join_matches_bruteforce_and_plan(spark):
    rng = random.Random(11)

    def mk(n, base_id):
        out = []
        for i in range(n):
            lo = float(rng.randrange(500))
            out.append((rng.randrange(3), lo, lo + rng.randrange(0, 80), base_id + i))
        return out

    a, b = mk(60, 0), mk(45, 100)
    adf = spark.createDataFrame(a, "k long, lo double, hi double, aid long")
    bdf = spark.createDataFrame(b, "k long, lo double, hi double, bid long")

    for by, bucket in [("k", None), (None, 37.0)]:
        out = overlap_join(adf, bdf, ("lo", "hi"), ("lo", "hi"), by=by, bucket=bucket)
        want_cols = {"k", "lo", "hi", "aid", "lo_right", "hi_right", "bid"}
        if by is None:
            want_cols.add("k_right")  # right key is payload when not a join key
        assert set(out.columns) == want_cols
        want = {(x[3], y[3]) for x in a for y in b
                if (by is None or x[0] == y[0])
                and max(x[1], y[1]) <= min(x[2], y[2])}
        got = [(r["aid"], r["bid"]) for r in out.collect()]
        assert set(got) == want, by
        assert len(got) == len(want)  # exactly-once, no dup pairs
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_range_join_timestamps(tables, spark):
    ev = tables["events"]
    windows = (ev.filter(F.col("event_type") == "error")
               .orderBy(F.col("ts").asc(), F.col("event_id").asc()).limit(5)
               .select(F.col("event_id").alias("wid"), F.col("ts").alias("lo"),
                       (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi")))
    out = range_join(ev.select("event_id", "ts"), windows, "ts", "lo", "hi")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["lo"] <= r["ts"] <= r["hi"]
    # cross-check one window against a plain filter count
    w = windows.first()
    expect = ev.filter((F.col("ts") >= F.lit(w["lo"])) & (F.col("ts") <= F.lit(w["hi"]))).count()
    assert sum(1 for r in rows if r["wid"] == w["wid"]) == expect
