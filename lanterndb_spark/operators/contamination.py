"""Benchmark decontamination — n-gram overlap against an evaluation set.

Before training, every serious pipeline checks the corpus against its
eval benchmarks: a training document that shares a long-enough word
n-gram with an eval document leaks the benchmark into the weights
(GPT-3 appendix C / PaLM-style "13-gram decontamination"). This module
computes per-document overlap counts and a contaminated flag.

Scale shape (the part that matters at 100 TB):

- The eval side is SMALL (benchmarks are thousands of docs, not
  billions) — its distinct n-gram set is broadcast, so the corpus is
  never shuffled to meet it. ``.explain`` shows BroadcastHashJoin on
  the gram key.
- The corpus side is a projection (tokenize -> gram array, all column
  HOFs) followed by an explode of DISTINCT grams per doc. The inner
  broadcast join keeps ONLY matching rows, so the one real shuffle —
  groupBy(doc_id) to count hits — moves just the contaminated slice,
  which is tiny by construction.
- The final left join back onto (doc_id, n_grams) restores hit-less
  docs with hits=0; it joins a full-corpus projection against the tiny
  hit table, again broadcastable.

Normalization: grams are built over ``tokenize(col, stopwords=None)``
(lowercase, non-alphanumerics stripped) so cosmetic edits — case,
punctuation, extra whitespace — don't hide a leaked benchmark string.

The reference has no decontamination surface; this is one of the
training-data extensions the Spark engine adds (see README). The gram
builder mirrors functions/text.py word_ngrams' slice-transform shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.text import _ngrams_of, expr_let, tokenize


def _norm_grams(col, n: int) -> Column:
    """Distinct normalized word n-grams of ``col`` as space-joined
    strings ([] when the text has fewer than ``n`` tokens). Token array
    let-bound (expr_let's plan-shape rule — measured 8x at sf0.1)."""
    return expr_let(
        tokenize(col, stopwords=None),
        lambda tk: F.array_distinct(_ngrams_of(tk, n)),
    )


def eval_ngrams(
    eval_df: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Corpus-wide distinct n-gram set of the eval benchmark: one
    ``gram`` column. Small by assumption (eval sets are); callers
    broadcast it."""
    return (
        eval_df.select(F.explode(_norm_grams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document eval overlap: ``id_col, n_grams, hits, contaminated``.

    ``n_grams`` is the count of distinct normalized n-grams in the doc,
    ``hits`` how many of those appear anywhere in ``eval_df``, and
    ``contaminated`` is ``hits >= min_hits``. Keep the clean corpus with
    ``docs.join(result.filter(~col("contaminated")), id_col, "left_semi")``.
    """
    grams = eval_ngrams(eval_df, eval_text_col or text_col, n)
    doc_grams = docs.select(
        F.col(id_col), _norm_grams(F.col(text_col), n).alias("__grams")
    )
    # ONE corpus pass (r14): carry size(__grams) through the explode and
    # group on (id, n_grams) — both keys are functionally dependent on
    # the doc, so cardinality is unchanged. The former shape tokenized
    # the corpus TWICE (once for the hits explode, once for the n_grams
    # base) and joined the two corpus-sized frames back together; at
    # bench scale that join even broadcast the full base. explode_outer
    # keeps gram-less docs ([] and NULL arrays) as one NULL-gram row, so
    # every doc still emits an output row; count("gram") over NULLs
    # never miscounts because a left-joined __hit is NULL exactly when
    # gram is NULL or unmatched. n_grams preserves size() semantics
    # bit-for-bit (including size(NULL) = -1).
    exploded = doc_grams.select(
        id_col,
        F.size("__grams").cast("int").alias("n_grams"),
        F.explode_outer("__grams").alias("gram"),
    )
    hit = exploded.join(
        F.broadcast(grams.withColumn("__hit", F.lit(1))), "gram", "left"
    )
    return (
        hit.groupBy(id_col, "n_grams")
        .agg(F.count("__hit").cast("int").alias("hits"))
        .select(
            id_col,
            "n_grams",
            "hits",
            (F.col("hits") >= F.lit(int(min_hits))).alias("contaminated"),
        )
    )


def decontaminate_semantic(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cos_dist: float = 0.1,
    method: str = "brute",
    nbits: int = 128,
    oversample: int = 20,
    seed: int = 42,
    max_hits_per_bench: int | None = None,
) -> DataFrame:
    """Embedding-space eval overlap — the semantic complement of the
    n-gram :func:`decontaminate` (paraphrased eval leakage that shares no
    5-gram still sits next to the eval item in embedding space).

    Returns ``id_col, min_bench_dist, contaminated`` per corpus row, with
    ``contaminated = min cos_dist to any bench row <= max_cos_dist``.

    - ``brute`` (default, exact): bench broadcasts (eval sets are small
      by nature — the same assumption the n-gram path makes of its gram
      table) and the min-distance folds map-side; cost is one
      corpus-scan × |bench| vector ops, zero shuffle beyond the k-sized
      agg. This is also the ORACLE semantics.
    - ``srp``: build an SRP sketch index on the corpus and batch-probe
      the bench rows at ``oversample`` — sub-linear candidate scoring
      when the bench itself is large; approximate (sketch recall), so
      ``contaminated`` can miss borderline rows. Use for bench sets too
      big to broadcast. Each bench row flags at most
      ``max_hits_per_bench`` corpus rows (default: 50×oversample) — a
      widely-contaminating bench item (boilerplate duplicated across the
      corpus) needs a higher cap or the brute path; this cap is
      independent of ``oversample`` (which controls sketch-ranking
      recall, not the detection budget).
    """
    from lanterndb_spark.functions.distance import cos_dist

    if method == "brute":
        b = F.broadcast(bench.select(F.col(vec_col).alias("__bv")))
        return (
            corpus.select(id_col, vec_col)
            .join(b)
            .groupBy(id_col)
            .agg(F.min(cos_dist(vec_col, "__bv")).alias("min_bench_dist"))
            .select(
                id_col,
                "min_bench_dist",
                (F.col("min_bench_dist") <= F.lit(float(max_cos_dist))).alias(
                    "contaminated"
                ),
            )
        )
    if method == "srp":
        from lanterndb_spark.operators.lsh import build_srp, srp_search_batch

        idx = build_srp(corpus, vec_col, nbits=nbits, seed=seed)
        queries = [list(map(float, r[vec_col])) for r in bench.select(vec_col).collect()]
        # detection budget per bench row is its own knob — previously k was
        # coupled to oversample, silently capping each bench row at 20
        # flagged corpus rows (ADVICE r3)
        k = max_hits_per_bench if max_hits_per_bench is not None else 50 * max(1, oversample)
        hits = srp_search_batch(
            idx, queries, k=max(1, k), oversample=oversample,
            metric="cos", id_col=id_col,
        ).filter(F.col("dist") <= F.lit(float(max_cos_dist)))
        flagged = hits.groupBy(id_col).agg(F.min("dist").alias("min_bench_dist"))
        return (
            corpus.select(id_col)
            .join(flagged, id_col, "left")
            .select(
                id_col,
                "min_bench_dist",
                F.col("min_bench_dist").isNotNull().alias("contaminated"),
            )
        )
    raise ValueError(f"method must be brute|srp: {method}")
