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
