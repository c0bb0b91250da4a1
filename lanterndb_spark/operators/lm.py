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
