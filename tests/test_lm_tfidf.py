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


# ------------------------------------------------------- bigram model

def test_bigram_score_hand_computed(spark):
    from lanterndb_spark.operators.lm import bigram_score, build_bigram_counts

    docs = _docs(spark, [(1, "a b a b"), (2, "b a")])
    vocab = build_vocab(docs)          # a:3 b:3, |V|=2
    bigrams = build_bigram_counts(docs)  # ab:2, ba:2
    got = {r["doc_id"]: r for r in bigram_score(docs, vocab, bigrams).collect()}
    # doc 1 bigrams: ab, ba, ab -> lp = ln((c_bi+1)/(c_prev+|V|+1))
    lp = lambda c_bi, c_prev: math.log((c_bi + 1) / (c_prev + 2 + 1))
    want1 = (2 * lp(2, 3) + lp(2, 3)) / 3
    assert abs(got[1]["avg_logprob"] - round(want1, 6)) < 1e-9
    assert got[1]["n_bigrams"] == 3 and got[1]["bi_oov_rate"] == 0.0
    assert got[1]["ppl"] == round(math.exp(-got[1]["avg_logprob"]), 6)


def test_bigram_short_doc_nulls(spark):
    from lanterndb_spark.operators.lm import bigram_score, build_bigram_counts

    docs = _docs(spark, [(1, "a b"), (2, "solo"), (3, "")])
    vocab = build_vocab(docs)
    bigrams = build_bigram_counts(docs)
    got = {r["doc_id"]: r for r in bigram_score(docs, vocab, bigrams).collect()}
    # < 2 tokens -> no bigrams, NULL logprob/ppl, zero oov rate
    for d in (2, 3):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["avg_logprob"] is None and got[d]["ppl"] is None
        assert got[d]["bi_oov_rate"] == 0.0
    assert got[1]["n_bigrams"] == 1


def test_bigram_oov_and_unseen_context(spark):
    from lanterndb_spark.operators.lm import bigram_score, build_bigram_counts

    train = _docs(spark, [(1, "a b c")])
    vocab = build_vocab(train)             # a,b,c -> |V|=3
    bigrams = build_bigram_counts(train)   # ab, bc
    test = _docs(spark, [(9, "a b zzz")])  # "b zzz" unseen bigram
    row = bigram_score(test, vocab, bigrams).collect()[0]
    assert row["bi_oov_rate"] == 0.5
    # unseen bigram with seen context b (count 1): ln(1/(1+3+1))
    want = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert abs(row["avg_logprob"] - round(want, 6)) < 1e-9


def test_bigram_min_count_floor(spark):
    from lanterndb_spark.operators.lm import build_bigram_counts

    docs = _docs(spark, [(1, "a b a b c")])
    counts = {r["bigram"]: r["count"]
              for r in build_bigram_counts(docs, min_count=2).collect()}
    assert counts == {"a\x1fb": 2}


def test_bigram_broadcast_plan(spark, tables):
    from lanterndb_spark.operators.lm import bigram_score, build_bigram_counts

    docs = tables["documents"]
    vocab = build_vocab(docs, min_count=2)
    bigrams = build_bigram_counts(docs)
    plan = (bigram_score(docs, vocab, bigrams)
            ._jdf.queryExecution().executedPlan().toString())
    # both count tables join broadcast; the corpus is never exchanged
    # into a sort-merge join
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
