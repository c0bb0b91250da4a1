"""Unigram LM scoring + TF-IDF top-k: hand-computed semantics, plan shape."""

import math

from pyspark.sql import functions as F

from lanterndb_spark.operators.lm import build_vocab, unigram_score
from lanterndb_spark.operators.tfidf import tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_unigram_score_hand_computed(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "a c")])
    vocab = build_vocab(docs)  # a:3 b:1 c:1, total 5, |V|=3
    got = {r["doc_id"]: r for r in unigram_score(docs, vocab).collect()}
    lp = lambda c: math.log((c + 1) / (5 + 3 + 1))
    want1 = (2 * lp(3) + lp(1)) / 3
    assert abs(got[1]["avg_logprob"] - round(want1, 6)) < 1e-9
    assert got[1]["oov_rate"] == 0.0 and got[1]["n_tokens"] == 3


def test_oov_rate_against_foreign_vocab(spark):
    train = _docs(spark, [(1, "a b c d")])
    vocab = build_vocab(train)
    test = _docs(spark, [(9, "a b zzz qqq")])
    row = unigram_score(test, vocab).collect()[0]
    assert row["oov_rate"] == 0.5
    # OOV tokens get the unseen mass, not -inf
    assert row["avg_logprob"] is not None and math.isfinite(row["avg_logprob"])


def test_min_count_floor(spark):
    docs = _docs(spark, [(1, "a a a rare")])
    vocab = build_vocab(docs, min_count=2)
    assert {r["token"] for r in vocab.collect()} == {"a"}
    # total reflects the FILTERED vocab mass
    assert vocab.collect()[0]["total"] == 3


def test_empty_doc_scores_null(spark):
    docs = _docs(spark, [(1, "a b"), (2, "")])
    vocab = build_vocab(docs)
    got = {r["doc_id"]: r for r in unigram_score(docs, vocab).collect()}
    assert got[2]["n_tokens"] == 0 and got[2]["avg_logprob"] is None
    assert got[2]["oov_rate"] == 0.0


def test_tfidf_rare_term_outranks_common(spark):
    docs = _docs(
        spark,
        [(1, "common rare"), (2, "common word"), (3, "common another")],
    )
    got = {r["doc_id"]: r for r in tfidf_topk(docs, k=1, stopwords=None).collect()}
    assert got[1]["term"] == "rare"  # equal tf: df=1 beats df=3


def test_tfidf_hand_computed_score(spark):
    docs = _docs(spark, [(1, "x x y"), (2, "y z")])
    rows = tfidf_topk(docs, k=10, stopwords=None).collect()
    got = {(r["doc_id"], r["term"]): r["score"] for r in rows}
    score = lambda fq, dl, df: round((fq / dl) * (math.log(3 / (df + 1)) + 1), 6)
    assert got[(1, "x")] == score(2, 3, 1)
    assert got[(1, "y")] == score(1, 3, 2)
    assert got[(2, "z")] == score(1, 2, 1)


def test_tfidf_rank_deterministic_ties_on_term(spark):
    docs = _docs(spark, [(1, "b a")])  # equal tf, equal df -> term asc
    rows = sorted(tfidf_topk(docs, k=2, stopwords=None).collect(), key=lambda r: r["rank"])
    assert [r["term"] for r in rows] == ["a", "b"]


def test_tfidf_plan_uses_window_group_limit(spark, tables):
    plan = tfidf_topk(tables["documents"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
