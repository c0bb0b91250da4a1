"""Decontamination: overlap semantics, normalization, plan shape."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.contamination import decontaminate, eval_ngrams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_copy_is_contaminated(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim leak
            (2, "completely unrelated text about spark executors and shuffles"),
        ],
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=5).collect()}
    assert got[1]["contaminated"] and got[1]["hits"] == got[1]["n_grams"]
    assert not got[2]["contaminated"] and got[2]["hits"] == 0


def test_normalization_catches_cosmetic_edits(spark):
    bench = _docs(spark, [(100, "The Quick, Brown Fox! Jumps over the lazy dog.")])
    corpus = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    row = decontaminate(corpus, bench, n=5).collect()[0]
    assert row["contaminated"]


def test_partial_overlap_counts_grams_not_docs(spark):
    # shares exactly one 3-gram ("c d e") with the benchmark
    bench = _docs(spark, [(100, "c d e x y z")])
    corpus = _docs(spark, [(1, "a b c d e f")])
    row = decontaminate(corpus, bench, n=3).collect()[0]
    assert row["hits"] == 1 and row["n_grams"] == 4
    assert row["contaminated"]
    row2 = decontaminate(corpus, bench, n=3, min_hits=2).collect()[0]
    assert not row2["contaminated"]


def test_short_docs_produce_no_grams(spark):
    bench = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "a b")])  # shorter than n
    row = decontaminate(corpus, bench, n=5).collect()[0]
    assert row["n_grams"] == 0 and row["hits"] == 0 and not row["contaminated"]


def test_repeated_gram_in_doc_counts_once(spark):
    bench = _docs(spark, [(100, "x y z")])
    corpus = _docs(spark, [(1, "x y z and x y z again")])
    row = decontaminate(corpus, bench, n=3).collect()[0]
    assert row["hits"] == 1  # distinct grams per doc


def test_eval_ngrams_distinct(spark):
    bench = _docs(spark, [(1, "a b c a b c"), (2, "a b c")])
    grams = {r["gram"] for r in eval_ngrams(bench, n=3).collect()}
    assert grams == {"a b c", "b c a", "c a b"}


def test_plan_broadcasts_eval_side(spark, tables):
    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
