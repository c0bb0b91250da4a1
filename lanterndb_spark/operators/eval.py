"""Retrieval-quality metrics: recall@k, precision@k, MRR@k, nDCG@k.

The evaluation half of a vector/search engine (the reference checks
recall in its index tests, e.g. hnsw_correct.sql's exact-equivalence and
the CLI autotune's recall column; this generalizes that into a reusable,
graded-relevance metric operator for ranking experiments at corpus
scale).

Shapes: everything is joins + windows on (query, doc) — per-query state
never leaves the executors; the per-query table is one row per query,
and means reduce it map-side. Ranks are dense 1-based with an explicit
deterministic tie-break, so results are engine-reproducible (the DuckDB
oracle recomputes every metric from the same frames).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_results(
    df: DataFrame,
    q_col: str,
    order_by: list[Column | str],
    rank_col: str = "rank",
) -> DataFrame:
    """1-based per-query rank via row_number — callers pass the full
    deterministic ordering (score plus a unique tie-break column)."""
    w = Window.partitionBy(q_col).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    q_col: str = "q_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query metrics: (q, n_ret, n_rel, recall, precision, mrr, ndcg)
    at cutoff ``k``.

    ``results``: (q, doc, rank 1-based); ``qrels``: (q, doc, rel >= 1,
    graded). Gains are 2^rel - 1, discounts log2(rank+1); IDCG ranks the
    qrels by rel desc (doc tie-break) so ndcg is 1.0 for a perfect
    ordering. Queries with no qrels are dropped (undefined metrics);
    queries whose top-k contains no relevant doc score 0, not NULL."""
    top = results.filter(F.col(rank_col) <= k).select(
        F.col(q_col).alias("q"), F.col(doc_col).alias("d"), F.col(rank_col).alias("r")
    )
    rels = qrels.select(
        F.col(q_col).alias("q"), F.col(doc_col).alias("d"),
        F.col(rel_col).cast("double").alias("rel"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    hits = (
        top.join(rels, ["q", "d"], "inner")
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.min("r").alias("first_rel"),
            F.sum(gain / F.log2(F.col("r") + 1)).alias("dcg"),
        )
    )
    ideal_w = Window.partitionBy("q").orderBy(F.col("rel").desc(), F.col("d").asc())
    ideal = (
        rels.withColumn("ir", F.row_number().over(ideal_w))
        .filter(F.col("ir") <= k)
        .groupBy("q")
        .agg(F.sum(gain / F.log2(F.col("ir") + 1)).alias("idcg"))
    )
    totals = rels.groupBy("q").agg(F.count(F.lit(1)).alias("n_rel"))
    n_ret = top.groupBy("q").agg(F.count(F.lit(1)).alias("n_ret"))
    return (
        totals.join(ideal, "q")
        .join(n_ret, "q", "left")
        .join(hits, "q", "left")
        .select(
            F.col("q").alias(q_col),
            F.coalesce("n_ret", F.lit(0)).alias("n_ret"),
            "n_rel",
            (F.coalesce("n_hit", F.lit(0)) / F.col("n_rel")).alias("recall"),
            (F.coalesce("n_hit", F.lit(0)) / F.lit(float(k))).alias("precision"),
            F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)).alias("mrr"),
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
        )
    )


def mean_metrics(per_query: DataFrame) -> DataFrame:
    """Macro-averaged summary of :func:`retrieval_metrics` output."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall").alias("mean_recall"),
        F.avg("precision").alias("mean_precision"),
        F.avg("mrr").alias("mean_mrr"),
        F.avg("ndcg").alias("mean_ndcg"),
    )


def precision_recall_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Classifier operating curve: one row per distinct score value
    (descending) with cumulative ``precision``, ``recall``, and ``f1``
    when thresholding at ``score >= threshold``. Ties collapse into one
    row (all rows at a score enter together — the curve a sklearn user
    expects, engine-reproducible because the cut points are the data's
    own score values, not interpolations).

    Shape: one groupBy(score) — distinct scores, usually far smaller
    than the eval set — then ONE unpartitioned cumulative window over
    them. Like ``classifier.binary_auc`` this is an EVAL-set operator
    (thousands of rows); the single-task window is bounded by distinct
    scores, not corpus size, but don't point it at a raw corpus either.
    """
    y = F.col(label_col).cast("double")
    per_score = df.select(
        F.round(F.col(score_col), round_to).alias("threshold"), y.alias("y")
    ).groupBy("threshold").agg(
        F.sum("y").alias("pos"), F.count("*").alias("n")
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total_pos = F.sum("pos").over(
        Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    curve = per_score.select(
        "threshold",
        F.sum("pos").over(w).alias("tp"),
        F.sum("n").over(w).alias("predicted"),
        total_pos.alias("total_pos"),
    ).select(
        "threshold",
        F.round(F.col("tp") / F.col("predicted"), round_to).alias("precision"),
        F.round(
            F.when(F.col("total_pos") > 0, F.col("tp") / F.col("total_pos"))
            .otherwise(F.lit(0.0)),
            round_to,
        ).alias("recall"),
    ).withColumn(
        "f1",
        F.round(
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
            round_to,
        ),
    )
    return curve.orderBy(F.col("threshold").desc())
