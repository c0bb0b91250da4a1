import math

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.bm25 import (
    build_postings,
    consolidate_postings,
    corpus_stats,
    search_bm25,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the reference's own golden corpus (lantern_extras/src/bm25_api.rs:20-25)
    return spark.createDataFrame(
        [
            (1, "apple banana orange"),
            (2, "apple apple banana"),
            (3, "banana banana orange"),
            (4, "kiwi pineapple banana"),
        ],
        "doc_id int, text string",
    )


def postings_map(df):
    return {r["term"]: r for r in df.collect()}


def test_postings_golden(corpus):
    # expectations from bm25_api.rs:45-84 (stemmed: apple->appl)
    p = postings_map(build_postings(corpus, stem=True))
    assert p["appl"]["term_freq"] == 2
    assert p["appl"]["doc_ids"] == [1, 2]
    assert p["appl"]["fqs"] == [1, 2]
    assert p["banana"]["term_freq"] == 4
    assert p["banana"]["doc_ids"] == [1, 2, 3, 4]
    assert p["banana"]["fqs"] == [1, 1, 2, 1]
    assert p["kiwi"]["term_freq"] == 1
    assert p["kiwi"]["doc_ids"] == [4]
    # every doc has 3 stemmed tokens
    assert {dl for r in p.values() for dl in r["doc_lens"]} == {3}


def test_postings_invariants(corpus):
    # doc_ids sorted+unique, arrays aligned (bm25_agg.rs:713-719)
    for r in build_postings(corpus).collect():
        assert r["doc_ids"] == sorted(set(r["doc_ids"]))
        assert len(r["doc_ids"]) == len(r["fqs"]) == len(r["doc_lens"]) == r["doc_ids_len"]
        assert r["term_freq"] == r["doc_ids_len"]


def test_search_golden_top_doc(corpus):
    # top BM25 doc for 'apple banana' is doc 2 (bm25_agg.rs:681-686)
    rows = search_bm25(corpus, "apple banana", stem=True, limit=4).collect()
    assert rows[0]["doc_id"] == 2


def test_search_scores_match_formula(corpus):
    n, avgdl = corpus_stats(corpus, stem=True)
    assert n == 4 and avgdl == pytest.approx(3.0)

    def score(fq, dl, tf, k1=1.2, b=0.75):
        idf = math.log((n - tf + 0.5) / (tf + 0.5) + 1)
        return idf * (fq * (k1 + 1)) / (fq + k1 * (1 - b + b * dl / avgdl))

    rows = {r["doc_id"]: r["bm25"] for r in search_bm25(corpus, "apple banana", stem=True).collect()}
    # doc2: appl fq=2 + banana fq=1; doc1: appl fq=1 + banana fq=1
    assert rows[2] == pytest.approx(score(2, 3, 2) + score(1, 3, 4))
    assert rows[1] == pytest.approx(score(1, 3, 2) + score(1, 3, 4))
    # doc3: banana fq=2 only
    assert rows[3] == pytest.approx(score(2, 3, 4))


def test_search_join_content(corpus):
    rows = search_bm25(corpus, "kiwi", stem=True, join_content=True).collect()
    assert rows[0]["doc_id"] == 4
    assert rows[0]["text"] == "kiwi pineapple banana"


def test_consolidate_merges_duplicate_term_rows(spark, corpus):
    p = build_postings(corpus, stem=True)
    extra = spark.createDataFrame(
        [(5, "banana banana")], "doc_id int, text string"
    )
    merged = consolidate_postings(p.unionByName(build_postings(extra, stem=True)))
    m = postings_map(merged)
    assert m["banana"]["doc_ids"] == [1, 2, 3, 4, 5]
    assert m["banana"]["fqs"] == [1, 1, 2, 1, 2]
    assert m["banana"]["term_freq"] == 5


def test_search_on_documents_table(tables):
    docs = tables["documents"]
    rows = search_bm25(docs, "spark window merge", limit=10, round_scores=6).collect()
    assert len(rows) == 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        search_bm25(corpus, "the and of")  # all stopwords


def test_stemmed_postings_and_search(tables):
    from lanterndb_spark.operators.bm25 import build_postings, corpus_stats, search_bm25

    docs = tables["documents"].limit(150)
    p = build_postings(docs, stem=True).cache()
    # stemming merges inflected forms: no term ends in common suffixes
    terms = [r["term"] for r in p.select("term").collect()]
    assert terms and not any(t.endswith("ing") and len(t) > 5 for t in terms)
    st = corpus_stats(docs, stem=True)
    out = search_bm25(docs, "merging windows", limit=5, postings=p, stats=st, stem=True)
    rows = out.collect()
    assert len(rows) > 0
