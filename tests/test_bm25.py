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


# ---------------------------------------------------------------- search_df


def test_search_df_matches_single_query(tables, spark):
    """Batch BM25 == the single-query form, query for query, on shared
    postings (same tokenizer, same rounding, same tie order) — with and
    without the term-isin prune."""
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25, search_bm25_df,
    )

    docs = tables["documents"]
    p = build_postings(docs).cache()
    st = corpus_stats(docs)
    qs = ["spark window merge", "shuffle partition", "broadcast join plan"]
    qdf = spark.createDataFrame(list(enumerate(qs)), "q_id int, query string")
    for prune in (8192, None):
        batch = search_bm25_df(
            docs, qdf, limit=5, postings=p, stats=st, round_scores=6,
            prune_terms=prune,
        ).collect()
        got = {}
        for r in sorted(batch, key=lambda r: (r["q_id"], -r["bm25"], r["doc_id"])):
            got.setdefault(r["q_id"], []).append((r["doc_id"], r["bm25"]))
        for qi, q in enumerate(qs):
            single = [
                (r["doc_id"], r["bm25"])
                for r in search_bm25(
                    docs, q, limit=5, postings=p, stats=st, round_scores=6
                ).collect()
            ]
            # a query whose terms miss the corpus is empty in BOTH forms
            assert got.get(qi, []) == single, f"query {qi} ({q!r}) prune={prune}"
    p.unpersist()


def test_search_df_all_stopword_query_drops(tables, spark):
    """A query with zero post-filter terms silently drops from the batch
    (the single-query form raises; a batch can't fail one row loudly)."""
    from lanterndb_spark.operators.bm25 import search_bm25_df

    docs = tables["documents"]
    qdf = spark.createDataFrame(
        [(0, "spark window merge"), (1, "the and of")], "q_id int, query string"
    )
    out = search_bm25_df(docs, qdf, limit=5, round_scores=6).collect()
    assert {r["q_id"] for r in out} == {0}


def test_search_df_pretokenized_profile(tables, spark):
    """terms_col/q_terms_col carry a custom tokenization profile through
    the batch form (both sides of the index share one tokenizer)."""
    from lanterndb_spark.functions.text import (
        text_to_stem_array, tokenize_tsvector_py,
    )
    from lanterndb_spark.operators.bm25 import search_bm25, search_bm25_df

    docs = tables["documents"].withColumn(
        "_ts", text_to_stem_array("text", engine="tsvector")
    )
    q = "spark window merge"
    qdf = spark.createDataFrame(
        [(7, tokenize_tsvector_py(q))], "q_id int, qterms array<string>"
    )
    batch = search_bm25_df(
        docs, qdf, limit=5, round_scores=6, terms_col="_ts",
        q_terms_col="qterms",
    ).collect()
    single = search_bm25(
        docs, q, limit=5, round_scores=6, terms_col="_ts",
        q_terms=tokenize_tsvector_py(q),
    ).collect()
    assert [(r["doc_id"], r["bm25"]) for r in sorted(batch, key=lambda r: (-r["bm25"], r["doc_id"]))] == [
        (r["doc_id"], r["bm25"]) for r in single
    ]


def test_search_df_on_consolidated_incremental_postings(tables, spark):
    """Batch search over postings built INCREMENTALLY (two half-corpus
    builds unioned, then consolidated) == batch search over a one-shot
    build: the streaming-ingest postings path and the batch query path
    compose."""
    from lanterndb_spark.operators.bm25 import (
        build_postings, consolidate_postings, corpus_stats, search_bm25_df,
    )

    docs = tables["documents"]
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = consolidate_postings(
        build_postings(half_a).unionByName(build_postings(half_b))
    )
    st = corpus_stats(docs)
    qdf = spark.createDataFrame(
        [(0, "spark window merge"), (1, "broadcast join plan")],
        "q_id int, query string",
    )
    a = search_bm25_df(
        docs, qdf, limit=5, postings=merged, stats=st, round_scores=6
    ).collect()
    b = search_bm25_df(
        docs, qdf, limit=5, postings=build_postings(docs), stats=st,
        round_scores=6,
    ).collect()
    key = lambda rs: sorted((r["q_id"], r["doc_id"], r["bm25"]) for r in rs)
    assert key(a) == key(b)


def test_search_bm25_df_null_q_ids_per_row(corpus, spark):
    """NULL q_id rows each keep their own top-k (formerly guaranteed by
    the surrogate wrap; r15's inline occurrence window must number the
    NULL window group per row too) and the NULL label survives to the
    output."""
    from lanterndb_spark.operators.bm25 import search_bm25_df

    withnull = spark.createDataFrame(
        [(None, "apple"), (None, "kiwi"), (3, "banana")],
        "q_id int, query string",
    )
    uniq = spark.createDataFrame(
        [(0, "apple"), (1, "kiwi"), (2, "banana")],
        "q_id int, query string",
    )
    got = search_bm25_df(corpus, withnull, limit=3, round_scores=6).collect()
    exp = search_bm25_df(corpus, uniq, limit=3, round_scores=6).collect()
    remap = {0: None, 1: None, 2: 3}
    key = lambda rows, rm=None: sorted(
        (((rm.get(r["q_id"], r["q_id"]) if rm else r["q_id"]) is None,
          rm.get(r["q_id"], r["q_id"]) if rm else r["q_id"]),
         r["doc_id"], r["bm25"]) for r in rows
    )
    assert len(got) == len(exp)  # per-row: both NULL rows answered
    assert key(got) == key(exp, remap)


def test_search_bm25_df_dup_path_runs_no_extra_job(corpus, spark):
    """The per-row answer for duplicate/NULL q_ids is plan-inline (one
    occurrence window over the query frame) — it must NOT cost a
    standalone detection job or a checkpoint like the old wrap did:
    job count with duplicate keys == job count with unique keys."""
    from lanterndb_spark.operators.bm25 import (
        build_postings, corpus_stats, search_bm25_df,
    )

    sc = spark.sparkContext
    p = build_postings(corpus).cache()
    p.count()
    st = corpus_stats(corpus)

    def njobs(qrows):
        qdf = spark.createDataFrame(qrows, "q_id int, query string")
        sc.parallelize([0], 1).count()
        ids = sc.statusTracker().getJobIdsForGroup()
        before = max(ids) if ids else -1
        search_bm25_df(corpus, qdf, limit=3, postings=p, stats=st).count()
        sc.parallelize([0], 1).count()
        ids = sc.statusTracker().getJobIdsForGroup()
        return (max(ids) if ids else -1) - before - 1

    n_uniq = njobs([(0, "apple"), (1, "kiwi")])
    n_dup = njobs([(7, "apple"), (7, "kiwi"), (None, "banana")])
    assert n_dup == n_uniq
    p.unpersist()


def test_search_bm25_df_duplicate_q_ids_per_row(corpus, spark):
    """Duplicate q_id VALUES answer per ROW (r12): q_id=7 appears with
    two DIFFERENT query texts; each keeps its own top-k instead of
    scoring the union of their terms as one query."""
    from lanterndb_spark.operators.bm25 import search_bm25_df

    dup = spark.createDataFrame(
        [(7, "apple"), (7, "kiwi"), (3, "banana")],
        "q_id int, query string",
    )
    uniq = spark.createDataFrame(
        [(0, "apple"), (1, "kiwi"), (2, "banana")],
        "q_id int, query string",
    )
    got = search_bm25_df(corpus, dup, limit=3, round_scores=6).collect()
    exp = search_bm25_df(corpus, uniq, limit=3, round_scores=6).collect()
    remap = {0: 7, 1: 7, 2: 3}
    key = lambda rows, rm=None: sorted(
        ((rm.get(r["q_id"], r["q_id"]) if rm else r["q_id"]),
         r["doc_id"], r["bm25"]) for r in rows
    )
    assert len(got) == len(exp)  # per-row, not merged term-union
    assert key(got) == key(exp, remap)
    # escape hatch: unique_q_ids=True merges — duplicates score as one
    # union-of-terms query. 'apple' + 'banana' overlap on docs 1-3, so
    # the merged scores differ from both single-term lists.
    dup2 = spark.createDataFrame(
        [(7, "apple"), (7, "banana")], "q_id int, query string"
    )
    merged = search_bm25_df(
        corpus, dup2, limit=4, round_scores=6, unique_q_ids=True
    ).collect()
    assert {r["q_id"] for r in merged} == {7}
    one = search_bm25_df(
        corpus, spark.createDataFrame([(7, "apple")], "q_id int, query string"),
        limit=4, round_scores=6,
    ).collect()
    assert key(merged) != key(one)
