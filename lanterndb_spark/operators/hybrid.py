"""Weighted multi-vector (hybrid) search.

Reference: ``lantern.weighted_vector_search``
(lantern_hnsw/sql/lantern.sql:673-819). Semantics reproduced exactly:

- joint metric = Σ w_i * (col_i <op> vec_i)            (lantern.sql:732-740)
- exact=True  → one scan, optional ``joint < max_dist`` filter, ORDER BY
  joint metric                                          (lantern.sql:748-762)
- exact=False → per-column candidate query ``ORDER BY col_i <op> vec_i
  LIMIT ef`` (each with the same max_dist WHERE), UNION ALL, dedup by id
  (DISTINCT ON), final ORDER BY joint                   (lantern.sql:769-806)

Spark recast is 1:1 with built-ins: per-column ``orderBy.limit(ef)``
(TakeOrderedAndProject) → ``unionByName`` → ``dropDuplicates([id])`` →
joint score column → filter → final sort. At scale each candidate query is
a partition-local top-ef + k-sized merge, and the union/dedup runs over at
most ``n_cols * ef`` rows — driver-safe by construction.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.distance import distance, query_vec

# Upper bound on concurrent candidate-stage constructions in
# weighted_vector_search_df (guide §2.6 — overlap independent driver
# work). Each term's stage build runs eager driver jobs (ivf's routed
# persist + rollup, knn_join's capped collect) that are independent of
# the other terms AND of the duplicate-q_id check, yet ran sequentially
# before r14 (measured: 0.49 s check + 1.0 s ivf + 0.28 s knn on the
# bench's 2-term/256-query shape — a sum where a max suffices). 0
# restores the sequential order. Thread-safe: the operators on this
# path mutate no session state, and PySpark's pinned-thread mode gives
# each Python thread its own JVM-side property map.
_STAGE_THREADS = int(os.environ.get("LDB_HYBRID_STAGE_THREADS", "8"))


def _joint(terms, metric) -> Column:
    parts = [
        F.lit(float(w)) * distance(metric, col, q if isinstance(q, Column) else query_vec(q))
        for (w, col, q) in terms
    ]
    return reduce(lambda a, b: a + b, parts)


def _index_candidate_ids(idx, q, ef: int, id_col: str, metric: str = "l2sq") -> DataFrame:
    """Top-ef ids for one term from an ANN index (the reference's
    candidate queries run against the per-column HNSW indexes,
    lantern.sql:769-806 — here the IVF / SRP backends stand in).

    ``metric`` is the joint metric: the reference's candidate queries
    rank by ``col_i <op> vec_i`` with the SAME op as the joint score
    (lantern.sql:769-806), so it forwards to the ivf/srp rerank. An
    hnsw graph bakes its metric at build — a mismatch raises rather
    than silently ranking candidates by a different distance."""
    from lanterndb_spark.operators.hnsw import HnswIndex, hnsw_candidates
    from lanterndb_spark.operators.ivf import IvfIndex, ivf_search
    from lanterndb_spark.operators.lsh import SrpIndex, srp_search

    if not isinstance(q, list):
        raise TypeError("index-backed candidate terms need a list query vector")
    if isinstance(idx, SrpIndex):
        return srp_search(idx, q, k=ef, metric=metric, id_col=id_col).select(id_col)
    if isinstance(idx, IvfIndex):
        return ivf_search(idx, q, k=ef, metric=metric, id_col=id_col).select(id_col)
    if isinstance(idx, HnswIndex):
        if idx.metric != metric:
            raise ValueError(
                f"hnsw index was built with metric={idx.metric!r}; candidate "
                f"ranking for a {metric!r} joint needs a matching graph"
            )
        # the graph backend IS the reference's per-column candidate index
        # (lantern.sql:769-806 runs these against lantern_hnsw indexes)
        return (
            hnsw_candidates(idx, q, k=ef, ef=ef)
            .orderBy(F.col("dist").asc(), F.col("__gid").asc())
            .limit(ef)
            .select(F.col("__gid").alias(id_col))
        )
    raise TypeError(f"unsupported index type for hybrid candidates: {type(idx)!r}")


def weighted_vector_search(
    df: DataFrame,
    terms: list[tuple[float, str, list | Column]],
    id_col: str = "id",
    metric: str = "l2sq",
    ef: int = 100,
    max_dist: float | None = None,
    exact: bool = False,
    limit: int | None = None,
    joint_col: str = "joint_dist",
    indexes: dict | None = None,
) -> DataFrame:
    """``terms`` is a list of (weight, vector_column, query_vector), one to
    three entries in the reference, any number here.

    ``indexes`` (optional) maps a vector column name to a built ANN index
    (``IvfIndex`` / ``SrpIndex``); that term's candidate stage then probes
    the index instead of exact-scanning the table — the reference's
    actual candidate mode, where each per-column query rides its HNSW
    index. Columns without an entry keep the exact top-ef scan. The
    candidate id set (≤ ef rows) broadcasts back onto the scored base."""
    if not terms:
        raise ValueError("need at least one (weight, col, query) term")
    joint = _joint(terms, metric)
    base = df.withColumn(joint_col, joint)
    if max_dist is not None:
        base = base.filter(F.col(joint_col) < F.lit(float(max_dist)))

    if exact:
        out = base
    else:
        candidates = []
        for (_w, col, q) in terms:
            idx = (indexes or {}).get(col)
            if idx is not None:
                ids = _index_candidate_ids(idx, q, ef, id_col, metric=metric)
                candidates.append(base.join(F.broadcast(ids), id_col, "left_semi"))
                continue
            qc = q if isinstance(q, Column) else query_vec(q)
            d = distance(metric, col, qc)
            candidates.append(
                base.orderBy(d.asc(), F.col(id_col).asc()).limit(ef)
            )
        out = reduce(DataFrame.unionByName, candidates).dropDuplicates([id_col])

    out = out.orderBy(F.col(joint_col).asc(), F.col(id_col).asc())
    if limit is not None:
        out = out.limit(limit)
    return out


def weighted_vector_search_df(
    df: DataFrame,
    terms: list[tuple[float, str, str]],
    queries: DataFrame,
    id_col: str = "id",
    q_id_col: str = "q_id",
    metric: str = "l2sq",
    ef: int = 100,
    max_dist: float | None = None,
    limit: int | None = None,
    joint_col: str = "joint_dist",
    indexes: dict | None = None,
    nprobe: int = 4,
    unique_q_ids: bool = False,
) -> DataFrame:
    """Per-query weighted multi-vector search for a whole DataFrame of
    queries in ONE distributed job — the batch recast of
    :func:`weighted_vector_search` (reference semantics
    lantern.sql:769-806 are one-query-per-call; an eval or reranking
    pass at scale is 10^5+ queries). ``terms`` is (weight, vector_col,
    query_vector_col) — the third element NAMES a column of ``queries``
    (the single-query form takes a literal/Column instead).

    Plan: each term's candidate stage is itself a batch form —
    ``ivf_search_df`` / ``hnsw_search_df`` when ``indexes`` carries an
    index for the column (unbounded query volume), else the exact
    :func:`knn_join` (broadcast-small queries) — emitting per-query
    top-``ef`` ids. Candidate unions dedup per (q_id, id), join back to
    the base rows ONCE for joint scoring (the candidate set is
    ≤ n_terms·ef rows per query, so the join input is narrow), and a
    per-query rank-filtered window (WindowGroupLimit prunes map-side)
    orders by the joint metric with the id tie-break.

    ``max_dist`` filters the JOINT score after the candidate union —
    unlike the single-query form, which pushes the filter inside each
    candidate query, so the per-term ef budget here is spent before the
    filter; pass a larger ``ef`` when combining ``max_dist`` with tight
    limits. Returns (q_id_col, …base cols…, joint_col). Duplicate q_id
    VALUES are PER-ROW like every other batch surface (r12): without
    the wrap the scoring join-by-q_id would fan out across duplicates
    and the joint window would merge their candidate sets;
    ``unique_q_ids=True`` skips the one-aggregate detection pass."""
    from pyspark.sql import Window

    from lanterndb_spark.operators.knn import knn_join

    if not terms:
        raise ValueError("need at least one (weight, col, query_col) term")
    # the joint expression binds each term's query column AFTER the
    # scoring join with the base rows — a query column sharing a base
    # column's name would be ambiguous there (or silently bind to the
    # wrong side), so reject the collision up front (driver-only
    # validation, before any job runs)
    clash = sorted(
        {qc for (_w, _c, qc) in terms} & set(df.columns)
    )
    if clash:
        raise ValueError(
            f"query vector column(s) {clash} collide with base df columns; "
            "rename the query columns before calling"
        )

    def _build_stage(term):
        """One term's candidate stage: (ids frame, persisted caches).
        Every inner form runs with unique_q_ids=True — justified by the
        caller's assertion, by the surrogate wrap below, or (in the
        speculative build) by the stage being discarded when the
        concurrent dup-check comes back dirty."""
        (_w, col, qcol) = term
        stage_persisted: list[DataFrame] = []
        qsel = queries.select(q_id_col, qcol)
        idx = (indexes or {}).get(col)
        if idx is not None:
            from lanterndb_spark.operators.hnsw import HnswIndex
            from lanterndb_spark.operators.ivf import IvfIndex

            # isinstance, not type-name: IvfPqIndex subclasses IvfIndex
            # (its assigned table retains the raw vectors, so the plain
            # ivf candidate stage applies)
            kind = (
                "IvfIndex" if isinstance(idx, IvfIndex)
                else "HnswIndex" if isinstance(idx, HnswIndex)
                else type(idx).__name__
            )
            if kind == "IvfIndex":
                from lanterndb_spark.operators.ivf import ivf_search_df

                ids = ivf_search_df(
                    idx, qsel, k=ef, nprobe=nprobe, metric=metric,
                    id_col=id_col, q_id_col=q_id_col, q_vec_col=qcol,
                    unique_q_ids=True,
                )
                # carry the stage's persisted routed frame through the
                # transformations below (attachments don't propagate),
                # so release() on the final result still frees it
                stage_persisted.extend(
                    ids.__dict__.get("_lantern_persisted", [])
                )
            elif kind == "HnswIndex":
                from lanterndb_spark.operators.hnsw import hnsw_search_df

                # same guard as the single-query path
                # (_index_candidate_ids): an hnsw graph bakes its
                # metric at build, so a mismatched joint metric would
                # silently rank candidates by the wrong distance
                if idx.metric != metric:
                    raise ValueError(
                        f"hnsw index on {col!r} was built with "
                        f"metric={idx.metric!r}; candidate ranking for a "
                        f"{metric!r} joint needs a matching graph"
                    )
                # the graph batch form keys results by the graph's own
                # id column and emits a literal "q_id" (long on the
                # integral fast path, the caller's type under the
                # surrogate-key wrap) — restore the caller's names/types
                # so the union and joins line up (same recovery as
                # LanternTable.knn_batch's hnsw route)
                if getattr(idx, "id_col", id_col) != id_col:
                    raise ValueError(
                        f"index on {col!r} is keyed by "
                        f"{idx.id_col!r}, not id_col={id_col!r}"
                    )
                q_id_type = queries.schema[q_id_col].dataType.simpleString()
                ids = hnsw_search_df(
                    idx, qsel, k=ef, q_id_col=q_id_col, q_vec_col=qcol,
                    unique_q_ids=True,
                ).select(
                    F.col("q_id").cast(q_id_type).alias(q_id_col),
                    F.col(idx.id_col).alias(id_col),
                )
            else:
                raise ValueError(
                    f"no batch search form for index type {kind!r} on {col!r}"
                )
            return ids.select(q_id_col, id_col), stage_persisted
        kj = knn_join(
            df.select(id_col, col), col, qsel, qcol,
            k=ef, metric=metric, id_col=id_col, q_id_col=q_id_col,
            unique_q_ids=True,
        )
        return kj.select(q_id_col, id_col), stage_persisted

    # guide §2.6: the dup/NULL-key check and each term's candidate
    # construction run eager driver jobs (ivf's routed persist + rollup
    # collect, knn_join's capped collect) that are mutually independent
    # — overlap them instead of paying the sum. The dup-check overlaps
    # SPECULATIVELY: stages are built assuming unique keys (the common
    # case — every caller minting ids, and the wrap path itself) and
    # discarded when the check comes back dirty, so the dirty path
    # costs the same as the r13 sequential order plus the abandoned
    # builds, while the clean path pays max() instead of sum().
    built = None
    threads = _STAGE_THREADS
    if not unique_q_ids:
        from lanterndb_spark.operators.hnsw import (
            _has_duplicate_qids, _restore_surrogate, _surrogate_key_queries,
        )

        if threads:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(len(terms) + 1, threads + 1)
            ) as ex:
                dup_fut = ex.submit(_has_duplicate_qids, queries, q_id_col)
                stage_futs = [ex.submit(_build_stage, t) for t in terms]
                dup = dup_fut.result()
                if dup:
                    # discard the speculative builds; free their caches.
                    # Build errors are swallowed HERE only: the wrap
                    # path below rebuilds every stage and re-raises any
                    # real error on the keyed frame.
                    for fut in stage_futs:
                        try:
                            _ids, pers = fut.result()
                        except Exception:
                            continue
                        for p in pers:
                            p.unpersist()
                else:
                    built = [f.result() for f in stage_futs]
        else:
            dup = _has_duplicate_qids(queries, q_id_col)
        if dup:
            # same shared wrap as the ANN/bm25 batch forms; the helper
            # takes every term's query column as payload
            keyed = _surrogate_key_queries(
                queries, q_id_col,
                *dict.fromkeys(qc for (_w, _c, qc) in terms),
            )
            inner = weighted_vector_search_df(
                df, terms, keyed.drop("__orig_qid"), id_col=id_col,
                q_id_col=q_id_col, metric=metric, ef=ef, max_dist=max_dist,
                limit=limit, joint_col=joint_col, indexes=indexes,
                nprobe=nprobe, unique_q_ids=True,
            )
            tail = [c for c in inner.columns if c != q_id_col]
            return _restore_surrogate(
                inner, keyed, q_id_col, tail, key_col=q_id_col
            )
    if built is None:
        if threads and len(terms) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(len(terms), threads)
            ) as ex:
                built = list(ex.map(_build_stage, terms))
        else:
            built = [_build_stage(t) for t in terms]
    cand_parts = [ids for (ids, _pers) in built]
    persisted: list[DataFrame] = [  # candidate stages' internal caches
        p for (_ids, pers) in built for p in pers
    ]
    cand = reduce(DataFrame.unionByName, cand_parts).dropDuplicates(
        [q_id_col, id_col]
    )

    joint = _joint([(w, c, F.col(qc)) for (w, c, qc) in terms], metric)
    # only the q_id + term vectors ride the scoring join: extra query
    # columns must not leak into the output (documented shape), and a
    # query column shadowing a base column would make `joint` ambiguous
    qslim = queries.select(
        q_id_col, *dict.fromkeys(qc for (_w, _c, qc) in terms)
    )
    scored = (
        cand.join(df, on=id_col)
        .join(qslim, on=q_id_col)
        .withColumn(joint_col, joint)
        .drop(*[qc for (_w, _c, qc) in terms])
    )
    if max_dist is not None:
        scored = scored.filter(F.col(joint_col) < F.lit(float(max_dist)))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col(joint_col).asc(), F.col(id_col).asc()
    )
    out = scored.withColumn("__rn", F.row_number().over(w))
    if limit is not None:
        out = out.filter(F.col("__rn") <= limit)
    out = out.drop("__rn")
    if persisted:
        from lanterndb_spark.plans.shape import attach_persisted

        out = attach_persisted(out, *persisted)
    return out
