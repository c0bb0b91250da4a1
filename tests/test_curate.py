"""Curation gauntlet: rule priority, determinism, single-shuffle plan."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.curate import curate


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then sleeps all day"),
        (2, "short text"),                                       # too_short
        (3, "the quick brown fox jumps over the lazy dog and then sleeps all day"),  # dup of 1
        (4, "a b a b a b a b a b a b a b a b a b a b"),          # repetitive (if not low quality first)
        (5, "x@#z !$v% ^&pq* (zz) [kk] {qq} <lm> ~vv~ ::nn:: ;;cc;;"),  # sym-salad
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rule_priority_and_verdicts(spark):
    out = {r["doc_id"]: r for r in curate(_corpus(spark)).collect()}
    assert out[2]["reason"] == "too_short" and out[2]["kept"] is False
    assert out[1]["reason"] == "kept" and out[1]["split"] in {"train", "val", "test"}
    assert out[3]["reason"] == "duplicate"     # doc 1 holds the content key
    assert out[3]["split"] == "-"
    assert out[4]["kept"] is False             # repetition or quality fails it
    assert out[5]["reason"] == "low_quality"   # no stopwords, salad


def test_verdicts_partition_independent(spark):
    docs = _corpus(spark)
    a = {r["doc_id"]: (r["reason"], r["split"]) for r in curate(docs).collect()}
    b = {
        r["doc_id"]: (r["reason"], r["split"])
        for r in curate(docs.repartition(7, "text")).collect()
    }
    assert a == b


def test_single_shuffle(spark):
    plan = curate(_corpus(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
