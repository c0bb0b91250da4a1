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


def test_plan_tokenizes_corpus_once(spark, tables):
    """r14 fusion contract: the corpus is normalized/tokenized in ONE
    pass (explode_outer carried beside size()), not once for the hits
    explode and again for the n_grams base — so `array_distinct` (the
    _norm_grams fingerprint) appears exactly twice in the physical plan:
    corpus side + eval side. A corpus-sized join back is also gone."""
    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 19 == 0)
    plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("array_distinct") == 2
    assert "SortMergeJoin" not in plan


def test_semantic_decontamination_brute_exact(tables):
    import pytest
    """Brute mode: a corpus row identical to a bench row has dist 0 and
    is contaminated; min_bench_dist matches a numpy recomputation."""
    import numpy as np

    from lanterndb_spark.operators.contamination import decontaminate_semantic

    emb = tables["embeddings"].limit(60)
    bench = emb.filter(F.col("vec_id") < 5)
    corpus = emb  # bench rows included -> dist 0 for those ids
    out = {r["vec_id"]: r for r in decontaminate_semantic(
        corpus, bench, max_cos_dist=0.05).collect()}
    assert all(out[i]["contaminated"] and abs(out[i]["min_bench_dist"]) < 1e-9
               for i in range(5))
    B = np.array([r["embedding"] for r in bench.collect()], dtype=np.float64)
    for r in emb.collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        d = 1.0 - (B @ v) / (np.linalg.norm(B, axis=1) * np.linalg.norm(v))
        assert out[r["vec_id"]]["min_bench_dist"] == pytest.approx(d.min(), abs=1e-9)


def test_semantic_decontamination_srp_recall(tables):
    """SRP mode at generous oversample finds the exact-duplicate plants."""
    from lanterndb_spark.operators.contamination import decontaminate_semantic

    emb = tables["embeddings"]
    bench = emb.filter(F.col("vec_id") % 37 == 0)
    out = decontaminate_semantic(
        emb, bench, max_cos_dist=0.01, method="srp", oversample=50
    )
    flagged = {r["vec_id"] for r in out.filter("contaminated").collect()}
    planted = {r["vec_id"] for r in bench.collect()}
    assert planted <= flagged  # every bench row is its own duplicate
