"""TF-IDF keyword extraction — per-document top-k salient terms.

The classic corpus-analytics op (and the summarization/tagging stage of
document pipelines): score every (doc, term) by tf·idf and keep each
doc's top-k. Reuses the BM25 machinery's statistics shape (§2.6 is
BM25 = tf·idf with saturation; reference lantern_extras/src/bm25_agg.rs
computes the same df/tf inputs) but exposes the raw tf·idf ranking.

Formula (pinned for oracle parity, all in double, rounded 6dp):
``tf = count(term in doc) / len(doc)``;
``idf = ln((N + 1) / (df + 1)) + 1`` (smooth, positive);
``score = round(tf * idf, 6)``; ties break on term ascending.

Scale shape: explode → groupBy (doc, term) with map-side combine (the
shuffle carries combined counts, not raw tokens; doc length rides along
as a projected column) → df counts from a second map-combined groupBy
over the distinct pairs → broadcast (term, df) back → per-doc top-k via
WindowGroupLimit (map-side k-heaps BEFORE the window shuffle, the
cap_per_group pattern). Two combined-pair shuffles total; the raw token
stream is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lanterndb_spark.functions.text import STOPWORDS, tokenize

ROUND = 6


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = STOPWORDS,
) -> DataFrame:
    """Top-``k`` terms per doc: ``id_col, term, rank, score``.

    Docs with no tokens yield no rows. Deterministic: score desc, then
    term asc; ``rank`` is 1-based.
    """
    n_docs = docs.count()  # one scalar; N is part of the pinned formula
    # doc length rides the explode as a projected column (8 B/row) — the
    # alternative (re-join per-doc lengths) would cost a second shuffle
    toked = docs.select(
        F.col(id_col), tokenize(F.col(text_col), stopwords=stopwords).alias("__tk")
    )
    ex = toked.select(
        id_col,
        F.size("__tk").cast("double").alias("dl"),
        F.explode("__tk").alias("term"),
    )
    dt = ex.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("fq"), F.first("dl").alias("dl")
    )
    df_t = dt.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = dt.join(F.broadcast(df_t), "term").withColumn(
        "score",
        F.round(
            (F.col("fq") / F.col("dl"))
            * (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            ROUND,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "term", "rank", "score")
    )
