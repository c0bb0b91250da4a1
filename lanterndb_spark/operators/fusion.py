"""Rank fusion — merge lexical (BM25) and semantic (vector) retrieval.

Beyond-reference retrieval operator: the reference ships weighted
multi-VECTOR search (lantern.sql:673-819) and BM25 separately; fusing a
lexical and a semantic ranking is the step every retrieval deployment
does next. Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR'09)
is the standard because it needs NO score normalization: only ranks
enter, so BM25's unbounded scores and cosine's [0,2] never have to be
calibrated against each other.

    rrf(d) = Σ_r 1 / (k + rank_r(d))        (k=60 canonical)

Plan shape: each input ranking is already a top-n DataFrame (k-sized!);
fusion is a full-outer join of k-sized inputs + one projection — driver
and executor cost is O(Σ k_r), independent of corpus size. Determinism:
ranks come from the inputs' own (score, id) orderings; the fused
ordering tie-breaks on id.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def with_rank(df: DataFrame, score_col: str, id_col: str, ascending: bool) -> DataFrame:
    """Attach ``rank`` (1-based) by score with id tie-break. ``ascending``
    is True for distances (smaller better), False for scores like BM25."""
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    # single window over a k-sized input — the sort is driver-cheap by
    # construction; never call this on an unranked full table
    return df.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    k: int = RRF_K,
    limit: int | None = None,
    score_col: str = "rrf_score",
) -> DataFrame:
    """Fuse ranked lists (each with columns ``id_col, rank``) by RRF.

    Documents missing from a list contribute nothing for it (the standard
    convention). Output: ``id_col, rrf_score`` ordered best-first with id
    tie-break.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = [
        r.select(F.col(id_col), (1.0 / (F.lit(float(k)) + F.col("rank"))).alias("__c"))
        for r in rankings
    ]
    unioned = reduce(DataFrame.unionByName, parts)
    out = (
        unioned.groupBy(id_col)
        .agg(F.sum("__c").alias(score_col))
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    )
    return out.limit(limit) if limit is not None else out


def hybrid_lexical_semantic(
    bm25_topk: DataFrame,
    knn_topk: DataFrame,
    id_col: str,
    bm25_score_col: str = "bm25",
    dist_col: str = "dist",
    k: int = RRF_K,
    limit: int | None = None,
) -> DataFrame:
    """Convenience wrapper: rank a BM25 top-n (score desc) and a knn top-n
    (distance asc), RRF-fuse them."""
    a = with_rank(bm25_topk, bm25_score_col, id_col, ascending=False)
    b = with_rank(knn_topk, dist_col, id_col, ascending=True)
    return rrf_fuse([a, b], id_col, k=k, limit=limit)
