"""Repeated-span (substring) dedup: semantics + masking.

Pinned: windows shared by >= min_docs docs are flagged; overlapping and
adjacent windows merge into one maximal span; per-doc-only repetition
needs min_count; masking cuts exactly the merged spans and leaves
documents without repeats untouched.
"""

from pyspark.sql import functions as F

from lanterndb_spark.functions.text import tokenize_py
from lanterndb_spark.operators.spans import (
    mask_repeated_spans,
    repeated_spans,
    span_postings,
)

BOILER = "this license text is identical across many corpus documents here"


def _corpus(spark):
    rows = [
        (1, f"alpha beta gamma delta {BOILER} one two three"),
        (2, f"{BOILER} completely different tail content here now"),
        (3, "nothing shared with anybody else at all in this document ever"),
        (4, f"prefix words then {BOILER} and a suffix"),
        # doc 5 repeats a 10-gram within itself only
        (5, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 filler x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_boilerplate_found_and_merged(spark):
    spans = repeated_spans(_corpus(spark), "doc_id", "text", min_len=10, min_docs=2)
    rows = {r["doc_id"]: r for r in spans.collect()}
    n_boiler = len(BOILER.split())
    assert n_boiler == 10
    # docs 1, 2, 4 share the 10-token boilerplate; doc 3 and 5 (intra-doc
    # only) emit nothing under the distinct-doc scope
    assert set(rows) == {1, 2, 4}
    for doc_id, start in [(1, 4), (2, 0), (4, 3)]:
        r = rows[doc_id]
        assert (r["span_start"], r["span_end"]) == (start, start + n_boiler)
        assert r["span_tokens"] == n_boiler


def test_min_count_catches_within_doc_repeats(spark):
    spans = repeated_spans(
        _corpus(spark), "doc_id", "text", min_len=10, min_docs=2, min_count=2
    )
    by_doc = {r["doc_id"]: r for r in spans.collect()}
    assert 5 in by_doc
    # both copies of the 10-gram flag; they are disjoint so two spans —
    # grouped here into rows covering [0,10) and [11,21)
    doc5 = spans.filter(F.col("doc_id") == 5).orderBy("span_start").collect()
    assert [(r["span_start"], r["span_end"]) for r in doc5] == [(0, 10), (11, 21)]


def test_overlapping_windows_merge_to_maximal_span(spark):
    # 12 shared tokens -> three overlapping 10-windows -> ONE span [0, 12)
    shared = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, shared + " taila uniquea"), (2, shared + " tailb uniqueb")],
        "doc_id long, text string",
    )
    spans = repeated_spans(df, "doc_id", "text", min_len=10, min_docs=2)
    for r in spans.collect():
        assert (r["span_start"], r["span_end"], r["span_tokens"]) == (0, 12, 12)


def test_mask_cuts_exactly_the_spans(spark):
    out = {
        r["doc_id"]: r
        for r in mask_repeated_spans(
            _corpus(spark), "doc_id", "text", min_len=10, min_docs=2
        ).collect()
    }
    assert out[3]["tokens_removed"] == 0
    assert out[3]["text_deduped"] == " ".join(tokenize_py(out[3]["text"], None))
    for d in (1, 2, 4):
        assert out[d]["tokens_removed"] == 10
        assert BOILER not in out[d]["text_deduped"]
    assert out[1]["text_deduped"] == "alpha beta gamma delta one two three"
    assert out[2]["text_deduped"] == "completely different tail content here now"


def test_postings_count_and_short_docs_skip(spark):
    df = spark.createDataFrame(
        [(1, "only four tokens here"), (2, " ".join(f"t{i}" for i in range(15)))],
        "doc_id long, text string",
    )
    post = span_postings(df, "doc_id", "text", min_len=10)
    assert post.filter(F.col("id") == 1).count() == 0
    assert post.filter(F.col("id") == 2).count() == 6  # 15 - 10 + 1
