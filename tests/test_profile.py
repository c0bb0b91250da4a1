"""Profiling + constraint checks on hand-computable frames."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.profile import check_constraints, profile_table


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, None, None),
            (3, "b", 30.0),
        ],
        "id int, tag string, x double",
    )


def test_profile_stats(frame):
    p = {r["column"]: r for r in profile_table(frame).collect()}
    assert set(p) == {"id", "tag", "x"}
    assert p["id"]["n"] == 4 and p["id"]["n_distinct"] == 3
    assert p["tag"]["n_null"] == 1 and p["tag"]["null_frac"] == pytest.approx(0.25)
    assert p["tag"]["min_str"] == "a" and p["tag"]["max_str"] == "b"
    assert p["x"]["mean"] == pytest.approx(20.0)
    assert p["x"]["std"] == pytest.approx(10.0)
    assert p["tag"]["mean"] is None  # non-numeric → no moments


def test_profile_approx_mode(frame):
    p = {r["column"]: r for r in profile_table(frame, approx=True).collect()}
    # HLL at this cardinality is exact
    assert p["id"]["n_distinct"] == 3


def test_constraints(spark, frame):
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    out = {
        r["rule"]: r["violations"]
        for r in check_constraints(
            {"t": frame, "p": parent},
            [
                {"kind": "unique", "table": "t", "cols": ["id"]},
                {"kind": "not_null", "table": "t", "col": "tag"},
                {"kind": "foreign_key", "table": "t", "col": "id",
                 "ref_table": "p", "ref_col": "pid"},
                {"kind": "range", "table": "t", "col": "x", "min": 0, "max": 25},
            ],
        ).collect()
    }
    assert out["unique(t.id)"] == 1            # id=3 appears twice
    assert out["not_null(t.tag)"] == 1
    assert out["fk(t.id->p.pid)"] == 2         # both id=3 rows lack a parent
    assert out["range(t.x in [0,25])"] == 1    # 30.0; NULL not counted


def test_constraints_reject_unknown(spark, frame):
    with pytest.raises(ValueError):
        check_constraints({"t": frame}, [{"kind": "nope", "table": "t"}]).collect()


# ------------------------------------------------------- MAD outliers

def test_mad_hand_computed(spark):
    from lanterndb_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])],
        "id int, g string, x double",
    )
    rows = {r["id"]: r for r in mad_outliers(df, "x", ["g"], k=3.5).collect()}
    # median 3, absdevs [2,1,0,1,97] -> MAD 1
    assert rows[0]["grp_median"] == 3.0 and rows[0]["grp_mad"] == 1.0
    assert rows[4]["robust_z"] == round(97 / 1.4826, 6)
    assert rows[4]["is_outlier"] and not rows[0]["is_outlier"]


def test_mad_zero_scale_group(spark):
    from lanterndb_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 9.0)], "id int, x double"
    )
    rows = {r["id"]: r for r in mad_outliers(df, "x", None, k=2.0).collect()}
    # MAD = 0 (majority constant): no robust scale -> NULL z, never flagged
    assert rows[4]["grp_mad"] == 0.0
    assert rows[4]["robust_z"] is None and not rows[4]["is_outlier"]


def test_mad_groups_independent(spark):
    from lanterndb_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 12.0), (3, "a", 14.0),
         (4, "b", 1000.0), (5, "b", 1002.0), (6, "b", 1004.0)],
        "id int, g string, x double",
    )
    rows = {r["id"]: r for r in mad_outliers(df, "x", ["g"], k=3.0).collect()}
    # 1000-range values are NOT outliers within their own group
    assert not any(r["is_outlier"] for r in rows.values())
    assert rows[1]["grp_median"] == 12.0 and rows[4]["grp_median"] == 1002.0


# ------------------------------------------------------- histogram

def test_histogram_hand_computed(spark):
    from lanterndb_spark.operators.profile import histogram

    df = spark.createDataFrame([(float(v),) for v in [0, 1, 2, 3, 10]], "x double")
    rows = {r["bucket"]: r for r in histogram(df, "x", bins=5).collect()}
    # lo=0, hi=10, width=2: buckets [0,2) [2,4) ... [8,10]; x=10 clamps in
    assert len(rows) == 5
    assert rows[0]["n"] == 2 and rows[1]["n"] == 2 and rows[4]["n"] == 1
    assert rows[2]["n"] == 0 and rows[3]["n"] == 0   # zero-filled
    assert rows[0]["lo_edge"] == 0.0 and rows[4]["hi_edge"] == 10.0
    assert sum(r["n"] for r in rows.values()) == 5


def test_histogram_explicit_bounds_clamp(spark):
    from lanterndb_spark.operators.profile import histogram

    df = spark.createDataFrame([(-5.0,), (0.5,), (99.0,), (None,)], "x double")
    rows = {r["bucket"]: r["n"] for r in
            histogram(df, "x", bins=2, lo=0.0, hi=1.0).collect()}
    # -5 clamps into bucket 0; 0.5 lands in [0.5,1]; 99 clamps into
    # bucket 1; NULL dropped
    assert rows == {0: 1, 1: 2}


def test_histogram_degenerate_range(spark):
    from lanterndb_spark.operators.profile import histogram

    df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    rows = histogram(df, "x", bins=4).collect()
    assert sum(r["n"] for r in rows) == 2  # constant column still counts


# ------------------------------------------------------- zipf fit

def test_zipf_perfect_law(spark):
    from lanterndb_spark.operators.profile import zipf_fit

    # counts 64,32,16,8 over ranks 1..4: ln c = ln 64 - ln2 * ... slope
    # vs ln rank is NOT linear; use an exact power law c = 64 / rank:
    # ranks 1,2,4,8 -> perfectly linear in log-log with slope -1
    words = []
    for tok, cnt in [("a", 64), ("b", 32), ("c", 16), ("d", 8)]:
        words += [tok] * cnt
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    row = zipf_fit(docs, "text").collect()[0]
    # counts 64/32/16/8 at ranks 1/2/3/4: not exactly Zipf, but r2 high
    assert row["vocab_size"] == 4 and row["total_tokens"] == 120
    assert row["slope"] < 0 and row["r2"] > 0.9


def test_zipf_top_v_head_only(spark):
    from lanterndb_spark.operators.profile import zipf_fit

    docs = spark.createDataFrame(
        [(1, "x x x y y z w v u t s r q p o n m")], "doc_id int, text string"
    )
    row = zipf_fit(docs, "text", top_v=2).collect()[0]
    # fit over 2 head tokens only; totals still describe the full vocab
    assert row["vocab_size"] == 14
    assert row["slope"] is not None


# ------------------------------------------------------- PSI drift

def test_psi_identical_samples_near_zero(spark):
    from lanterndb_spark.operators.profile import psi_drift

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    rows = psi_drift(df, df, "x", bins=10).collect()
    assert len(rows) == 10
    psi = sum(r["contrib"] for r in rows)
    assert abs(psi) < 1e-9  # identical distributions -> PSI 0


def test_psi_detects_shift(spark):
    from lanterndb_spark.operators.profile import psi_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i % 10 + 5),) for i in range(100)], "x double")
    rows = psi_drift(a, b, "x", bins=10).collect()
    psi = sum(r["contrib"] for r in rows)
    assert psi > 0.25  # clearly drifted
    # contributions are individually non-negative (both factors share sign)
    assert all(r["contrib"] >= 0 for r in rows)


def test_psi_empty_buckets_finite(spark):
    from lanterndb_spark.operators.profile import psi_drift

    a = spark.createDataFrame([(0.0,), (1.0,)], "x double")
    b = spark.createDataFrame([(9.0,), (10.0,)], "x double")
    rows = psi_drift(a, b, "x", bins=5).collect()
    # disjoint ranges: every bucket empty on one side; add-half keeps
    # all contributions finite
    import math
    assert all(math.isfinite(r["contrib"]) for r in rows)
    assert sum(r["frac_a"] for r in rows) == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------- grouped regression

def test_grouped_linreg_hand_computed(spark):
    from lanterndb_spark.operators.profile import grouped_linreg

    df = spark.createDataFrame(
        [("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),   # y = 2x + 1
         ("b", 1.0, 1.0), ("b", 2.0, 1.0)],                    # y = 1
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in grouped_linreg(df, "x", "y", ["g"]).collect()}
    assert got["a"]["slope"] == 2.0 and got["a"]["intercept"] == 1.0
    assert got["a"]["r2"] == 1.0 and got["a"]["n"] == 3
    assert got["b"]["slope"] == 0.0


def test_grouped_linreg_degenerate(spark):
    from lanterndb_spark.operators.profile import grouped_linreg

    df = spark.createDataFrame(
        [("a", 1.0, 3.0), ("b", 2.0, 1.0), ("b", 2.0, 9.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in grouped_linreg(df, "x", "y", ["g"]).collect()}
    assert got["a"]["slope"] is None       # one point
    assert got["b"]["slope"] is None       # zero x-variance


# ------------------------------------------------- quantile binning

def test_quantile_bin_quartiles(spark):
    from lanterndb_spark.operators.profile import quantile_bin

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "id int, x double"
    )
    got = {r["id"]: r["qbin"] for r in
           quantile_bin(df, "x", n_bins=4, tiebreak_col="id").collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4}


def test_quantile_bin_grouped_and_ties(spark):
    from lanterndb_spark.operators.profile import quantile_bin

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0), (4, "a", 5.0),
         (5, "b", 1.0), (6, "b", 2.0)],
        "id int, g string, x double",
    )
    got = {r["id"]: r["qbin"] for r in
           quantile_bin(df, "x", n_bins=2, group_cols=["g"],
                        tiebreak_col="id").collect()}
    # all-tie group splits deterministically by id; groups independent
    assert got[1] == got[2] == 1 and got[3] == got[4] == 2
    assert got[5] == 1 and got[6] == 2
