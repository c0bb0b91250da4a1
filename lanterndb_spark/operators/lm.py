"""Unigram language-model scoring — the perplexity-filter analogue.

CCNet/Gopher-style pipelines score documents with a language model and
drop the tails (gibberish scores low, boilerplate scores suspiciously
high). A full KenLM doesn't belong in a SQL engine, but its cheap
stand-in — a corpus-trained UNIGRAM model — expresses entirely in
relational algebra, which makes it reproducible by the DuckDB oracle
and shuffle-bounded at any scale:

- ``build_vocab``: one map-side-combined groupBy over exploded tokens
  → (token, count) with a ``min_count`` floor. The vocabulary is
  Zipf-bounded (vocab size ≪ corpus size), so it broadcasts.
- ``unigram_score``: per-doc mean log-probability under the smoothed
  unigram model, plus the out-of-vocabulary token rate. OOV tokens get
  the Laplace-smoothed unseen mass ``1/(total+|V|+1)``; both signals
  are projections + ONE broadcast join + one groupBy on doc_id.

At 100 TB: the vocab build shuffles (token, partial-count) pairs —
combiner-compressed to vocab size per map task; scoring never shuffles
the corpus (broadcast hash join), only per-doc partial sums.

The reference has no LM surface; training-pipeline extension (README).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.text import tokenize

ROUND = 6


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: ``token, count`` (count >= min_count), plus the
    corpus total token count on every row as ``total`` (precomputed here
    so scoring needs no second aggregation)."""
    toks = docs.select(
        F.explode(tokenize(F.col(text_col), stopwords=None)).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("count"))
    counts = counts.filter(F.col("count") >= int(min_count))
    # tiny cross join: one total row against the vocab table
    total = counts.agg(F.sum("count").cast("bigint").alias("total"))
    return counts.crossJoin(F.broadcast(total))


def unigram_score(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc unigram stats: ``id_col, n_tokens, oov_rate, avg_logprob``.

    ``avg_logprob`` is the mean over the doc's tokens of
    ``ln((count+1)/(total+|V|+1))`` with OOV counted as 0 — Laplace
    smoothing, so every token has positive probability. Empty docs score
    NULL logprob and 0.0 oov_rate. Rounded to 6dp for engine parity.
    """
    vsize = vocab.groupBy().agg(
        F.count("*").cast("bigint").alias("vsize"),
        F.max("total").alias("total"),
    )
    ex = docs.select(
        F.col(id_col),
        F.explode_outer(tokenize(F.col(text_col), stopwords=None)).alias("token"),
    )
    joined = (
        ex.join(F.broadcast(vocab.select("token", "count")), "token", "left")
        .crossJoin(F.broadcast(vsize))
    )
    lp = F.log(
        (F.coalesce(F.col("count"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("total") + F.col("vsize") + F.lit(1)).cast("double")
    )
    per_tok = joined.select(
        id_col,
        F.col("token").isNotNull().cast("int").alias("is_tok"),
        F.when(F.col("token").isNotNull() & F.col("count").isNull(), 1)
        .otherwise(0).alias("is_oov"),
        F.when(F.col("token").isNotNull(), lp).alias("lp"),
    )
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("is_tok").cast("int").alias("n_tokens"),
            F.round(
                F.coalesce(
                    F.sum("is_oov") / F.nullif(F.sum("is_tok"), F.lit(0)), F.lit(0.0)
                ),
                ROUND,
            ).alias("oov_rate"),
            F.round(F.avg("lp"), ROUND).alias("avg_logprob"),
        )
    )


# ------------------------------------------------------- bigram model

SEP = "\x1f"  # token joiner that the tokenizer can never emit


def _bigram_col(text_col) -> "Column":
    """``array<string>`` of ``prev<US>token`` bigrams of the tokenize()
    stream — pure column expression, no explode until the caller asks."""
    tk = tokenize(F.col(text_col) if isinstance(text_col, str) else text_col,
                  stopwords=None)
    n = F.size(tk)
    prevs = F.slice(tk, 1, F.greatest(n - 1, F.lit(0)))
    nexts = F.slice(tk, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(prevs, nexts, lambda p, w: F.concat(p, F.lit(SEP), w))


def build_bigram_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus bigram table ``bigram, count`` (count >= min_count).

    One map-side-combined groupBy over exploded bigrams — same shuffle
    shape as :func:`build_vocab` (combiner compresses each map task to
    its local bigram vocabulary, Zipf-bounded well below corpus size).
    """
    ex = docs.select(F.explode(_bigram_col(text_col)).alias("bigram"))
    counts = ex.groupBy("bigram").agg(F.count("*").cast("bigint").alias("count"))
    return counts.filter(F.col("count") >= int(min_count))


def bigram_score(
    docs: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc CONDITIONAL bigram log-likelihood — the KenLM-perplexity
    stand-in one notch above :func:`unigram_score`:

        lp(w | prev) = ln( (c(prev,w) + 1) / (c(prev) + |V| + 1) )

    Laplace smoothing over the unigram vocabulary, with ``c(prev)`` the
    corpus unigram count of the context token (0 if unseen) and ``|V|``
    the vocabulary size. Output: ``id_col, n_bigrams, bi_oov_rate``
    (fraction of bigrams unseen in training), ``avg_logprob`` (mean over
    the doc's bigrams; NULL when the doc has < 2 tokens) and ``ppl``
    (exp(-avg_logprob) of the 6dp-rounded mean, for engine parity).

    Scale shape: bigram + unigram count tables broadcast (both
    Zipf-bounded); the corpus is never shuffled — explode, two broadcast
    hash joins, one groupBy on ``id_col``.
    """
    vsize = vocab.groupBy().agg(F.count("*").cast("bigint").alias("vsize"))
    ex = docs.select(
        F.col(id_col),
        F.explode_outer(_bigram_col(text_col)).alias("bigram"),
    ).withColumn("prev", F.split_part(F.col("bigram"), F.lit(SEP), F.lit(1)))
    joined = (
        ex.join(
            F.broadcast(bigrams.withColumnRenamed("count", "c_bi")),
            "bigram", "left")
        .join(
            F.broadcast(
                vocab.select(F.col("token").alias("prev"),
                             F.col("count").alias("c_prev"))),
            "prev", "left")
        .crossJoin(F.broadcast(vsize))
    )
    lp = F.log(
        (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("vsize") + F.lit(1)).cast("double")
    )
    per = joined.select(
        id_col,
        F.col("bigram").isNotNull().cast("int").alias("is_bi"),
        F.when(F.col("bigram").isNotNull() & F.col("c_bi").isNull(), 1)
        .otherwise(0).alias("is_oov"),
        F.when(F.col("bigram").isNotNull(), lp).alias("lp"),
    )
    out = per.groupBy(id_col).agg(
        F.sum("is_bi").cast("int").alias("n_bigrams"),
        F.round(
            F.coalesce(
                F.sum("is_oov") / F.nullif(F.sum("is_bi"), F.lit(0)), F.lit(0.0)
            ),
            ROUND,
        ).alias("bi_oov_rate"),
        F.round(F.avg("lp"), ROUND).alias("avg_logprob"),
    )
    return out.withColumn(
        "ppl", F.round(F.exp(-F.col("avg_logprob")), ROUND)
    )
