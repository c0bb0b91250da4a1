"""Repeated-span (substring-level) deduplication.

Document-level dedup (``operators/dedup.py``) drops whole near-duplicate
documents; this module removes *shared boilerplate inside otherwise
distinct documents* — license headers, navigation chrome, templated
footers — the ExactSubstr operation of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499). The
reference engine has no substring dedup; this extends the LLM-curation
surface per SURVEY §7.8.

Spark-first shape (instead of the paper's monolithic suffix array, which
needs the whole corpus in one address space):

1. positional token n-gram postings — every L-token window becomes
   ``(doc, start, md5(window))``; the md5 happens AT THE SOURCE so the
   shuffle moves 32-byte hashes, never L-token strings;
2. one hash-partitioned aggregate finds windows occurring in
   ``>= min_docs`` distinct documents (map-side partial on the hash key —
   uniform by construction, no skew);
3. matching window starts join back and merge into maximal per-document
   spans with a gaps-and-islands window (partitioned by doc, so state is
   bounded by a single document's length).

Every stage is a standard shuffle on a uniform key; nothing is
corpus-quadratic and no driver-side state exists, so the plan survives a
100 TB corpus. The postings table is persisted across its two uses
(duplicate-hash aggregate + join back) — at cluster scale prefer
``storage_level`` spill-to-disk or recompute; both uses shuffle by ``h``
either way.

Engine parity: tokenization is :func:`~lanterndb_spark.functions.text.
tokenize` (mirrorable in DuckDB via ``oracle.duck_tokens``) and the
window hash is ``md5`` of the space-joined gram, so the driver oracle
reproduces spans byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lanterndb_spark.functions.text import tokenize
from lanterndb_spark.plans.shape import (
    attach_persisted,
    explode_nonempty,
    widen_partitions,
)


def _positional_grams(tk: Column, length: int) -> Column:
    """array<struct<s:int, h:string>> of every ``length``-token window of an
    already-projected token array: start offset (0-based) + md5 of the
    space-joined window. ``tk`` must be a plain column reference
    (dedup._grams_over's plan-shape rule — inlining the tokenizer here
    re-evaluates it per element access)."""
    idx = F.sequence(F.lit(0), F.size(tk) - length)
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("s"),
            F.md5(F.array_join(F.slice(tk, i + 1, length), " ")).alias("h"),
        ),
    )


def span_postings(
    df: DataFrame, id_col: str, text_col: str, min_len: int = 10
) -> DataFrame:
    """(id, s, h): one row per ``min_len``-token window of every document —
    the positional inverted index both public entry points build on.
    Documents shorter than ``min_len`` tokens contribute nothing (a window
    that cannot exist cannot repeat)."""
    return explode_nonempty(
        widen_partitions(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        )
        .select("id", tokenize("_txt", stopwords=None).alias("tk"))
        .filter(F.size("tk") >= min_len)
        .select("id", _positional_grams(F.col("tk"), min_len).alias("pg")),
        "pg",
        "g",
        "id",
    ).select("id", F.col("g.s").alias("s"), F.col("g.h").alias("h"))


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 10,
    min_docs: int = 2,
    min_count: int | None = None,
) -> DataFrame:
    """Maximal token spans whose every ``min_len``-token window occurs in
    ``>= min_docs`` distinct documents (or, when ``min_count`` is set,
    ``>= min_count`` times anywhere — catching within-document
    boilerplate too). Returns ``(id, span_start, span_end, span_tokens)``
    with 0-based token offsets, ``span_end`` exclusive; overlapping and
    adjacent flagged windows are merged, so spans never overlap and
    ``span_tokens = span_end - span_start >= min_len``.

    The gaps-and-islands merge: per document, a window start opens a new
    span iff it lies beyond the running maximum end of all earlier
    windows; the island id is the running count of such openings.
    """
    post = span_postings(df, id_col, text_col, min_len).persist()
    counted = post.groupBy("h").agg(
        F.count_distinct("id").alias("nd"), F.count("*").alias("nc")
    )
    flagged = F.col("nd") >= min_docs
    if min_count is not None:
        flagged = flagged | (F.col("nc") >= min_count)
    dup = counted.filter(flagged).select("h")

    hits = post.join(dup, on="h").select(
        "id", "s", (F.col("s") + F.lit(min_len)).alias("e")
    )
    spans = merge_islands(hits, id_col)
    return attach_persisted(spans, post)


def merge_islands(hits: DataFrame, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of flagged windows ``(id, s, e)`` into
    maximal disjoint spans ``(id_col, span_start, span_end, span_tokens)``.
    One per-doc window (prev-end max + island sum pipeline over a single
    exchange — plan-asserted in test_plans.py)."""
    w = Window.partitionBy("id").orderBy("s")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opened = hits.withColumn(
        "__new",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        opened.groupBy("id", "island")
        .agg(
            F.min("s").cast("bigint").alias("span_start"),
            F.max("e").cast("bigint").alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def mask_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 10,
    min_docs: int = 2,
    min_count: int | None = None,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Rewrite each document with its repeated spans cut out: the input
    plus ``out_col`` (space-joined surviving tokens) and
    ``tokens_removed``. Reconstruction is token-level — original
    whitespace/punctuation inside and around cut spans is not preserved
    (the paper cuts bytes; a tokenized corpus cuts tokens).

    The span list aggregates to one array per document (spans are merged
    and disjoint, so the per-doc array is small — bounded by
    len/min_len) and joins back; the cut itself is a pure projection:
    ``filter(tk, (t, i) -> no span covers i)``.
    """
    spans = repeated_spans(df, id_col, text_col, min_len, min_docs, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    out = df.join(per_doc, on=id_col, how="left").withColumn(
        "__tk", tokenize(text_col, stopwords=None)
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda sp: (i >= sp["span_start"]) & (i < sp["span_end"]),
    )
    kept = F.when(
        F.col("__spans").isNull(), F.col("__tk")
    ).otherwise(F.filter(F.col("__tk"), lambda t, i: ~covered(i)))
    out = (
        out.withColumn("__kept", kept)
        .withColumn(out_col, F.array_join("__kept", " "))
        .withColumn(
            "tokens_removed",
            (F.size("__tk") - F.size("__kept")).cast("bigint"),
        )
        .drop("__spans", "__tk", "__kept")
    )
    return attach_persisted(out, *spans.__dict__.get("_lantern_persisted", []))
