"""BM25 full-text retrieval: inverted-index build + top-k search.

Reference:
- postings build: ``create_bm25_table`` (lantern_extras/src/bm25_api.sql:31-56)
  — unnest terms, DISTINCT ON (doc,term), GROUP BY term with count +
  aligned array_agg's ordered by doc_id; corpus stats smuggled in a
  ``term IS NULL`` row (doc count, avg_doc_len × 100).
- scoring: ``bm25_agg`` (lantern_extras/src/bm25_agg.rs:125-159):
  idf = ln((N - tf + 0.5)/(tf + 0.5) + 1),
  score = idf * fq*(k1+1) / (fq + k1*(1 - b + b*dl/avgdl)),
  defaults k1=1.2 b=0.75 (lib.rs:44-46).
- search: ``search_bm25`` (bm25_api.sql:61-104): stem query → fetch term
  postings → aggregate → top-limit → optional join back to source.

Spark recast: the postings table is a plain DataFrame built with
explode + groupBy (map-side combine + shuffle agg — the parallel combine
the reference's UDAF never implemented, bm25_agg.rs:297-310). Scoring is a
pure column expression over exploded postings; top-k is orderBy.limit.
The reference's bloom-filter approximation for hot terms (postings > 8000)
exists purely to bound UDAF state — exact aggregation is shuffle-parallel
here, so we keep exactness (strictly better results, same API).

Scale: postings build is one shuffle on term; search touches only the
postings rows of the query's terms (filter pushdown on term), explodes
≤ |terms|·avg_postings rows, and aggregates per doc — no driver
materialization anywhere. Corpus stats are a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.text import STOPWORDS, tokenize, tokenize_py
from lanterndb_spark.plans.shape import explode_nonempty, widen_partitions

K1 = 1.2
B = 0.75


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms_col: str | None = None,
    stem: bool = False,
    stopwords: list[str] | None = STOPWORDS,
    salt: int = 16,
    max_term_freq: int | None = None,
) -> DataFrame:
    """Build the inverted index (the ``<tbl>_bm25`` analogue).

    Returns columns: term, term_freq, doc_ids_len, doc_ids, fqs, doc_lens —
    arrays aligned and sorted by doc_id (invariant: bm25_agg.rs:713-719).
    Pass ``terms_col`` to index a pre-tokenized array column instead.

    The per-term posting arrays are built with a two-stage salted
    collect (plans.shape.salted_collect_list): collect_list gets no
    map-side combine, so without salting a hot term (stop-word-like, in
    a stopword-light corpus) funnels its whole posting list through one
    reducer — the build's skew killer at 100 TB. ``max_term_freq`` drops
    terms whose posting list exceeds it, mirroring the reference's
    hot-term threshold GUC (lantern_extras/src/lib.rs:46,141-150) —
    such terms carry ~zero idf anyway.
    """
    # project terms ONCE on a widened skinny projection, then size+explode
    # reference the projected column — otherwise tokenize runs twice per row
    # and InferFiltersFromGenerate pushes a third copy into the scan
    # (lanterndb_spark/plans/shape.py for both pathologies)
    src = F.col(terms_col) if terms_col else F.col(text_col)
    base = widen_partitions(docs.select(F.col(id_col).alias("doc_id"), src.alias("_src")))
    terms = (
        F.col("_src") if terms_col
        else tokenize("_src", stopwords=stopwords, stem=stem)
    )
    wt = base.select("doc_id", terms.alias("_t"))
    exploded = explode_nonempty(
        wt.select("doc_id", F.size("_t").alias("doc_len"), F.col("_t")),
        "_t", "term", "doc_id", "doc_len",
    )
    per_doc_term = exploded.groupBy("doc_id", "term").agg(
        F.count("*").cast("int").alias("fq"),
        F.first("doc_len").cast("int").alias("doc_len"),
    )
    from lanterndb_spark.plans.shape import salted_collect_list

    # the salt guards the hot-term reducer funnel, whose worst case is a
    # posting list of ~every doc. For a small corpus (Catalyst size
    # estimate under 64 MiB — driver-side, no job) even that worst case
    # is a few-MB agg buffer, so the second collect stage buys nothing;
    # salt becomes the UPPER bound, like ivf's adaptive cogroup salt.
    salt_eff = salt
    try:
        stats = docs._jdf.queryExecution().optimizedPlan().stats()
        if float(str(stats.sizeInBytes())) < (64 << 20):
            salt_eff = 1
    except Exception:
        pass
    collected = salted_collect_list(
        per_doc_term, ["term"], F.struct("doc_id", "fq", "doc_len"),
        alias="z", salt=salt_eff,
    )
    out = collected.select(
        "term",
        F.size("z").cast("int").alias("term_freq"),
        F.size("z").cast("int").alias("doc_ids_len"),
        F.col("z.doc_id").alias("doc_ids"),
        F.col("z.fq").alias("fqs"),
        F.col("z.doc_len").alias("doc_lens"),
    )
    if max_term_freq is not None:
        out = out.filter(F.col("term_freq") <= max_term_freq)
    return out


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    terms_col: str | None = None,
    stem: bool = False,
    stopwords: list[str] | None = STOPWORDS,
) -> tuple[int, float]:
    """(corpus_size, avg_doc_len). The reference stores these in the
    postings table's NULL-term row, avg×100 (bm25_api.sql:48-50); we keep
    them as honest values."""
    src = F.col(terms_col) if terms_col else F.col(text_col)
    base = widen_partitions(docs.select(src.alias("_src")))
    terms = (
        F.col("_src") if terms_col else tokenize("_src", stopwords=stopwords, stem=stem)
    )
    row = base.select(
        F.count("*").alias("n"), F.avg(F.size(terms)).alias("avgdl")
    ).first()
    return int(row["n"]), float(row["avgdl"])


def bm25_score_expr(
    fq: Column, doc_len: Column, term_freq: Column,
    corpus_size: int, avg_doc_len: float, k1: float = K1, b: float = B,
) -> Column:
    """The exact scoring expression of bm25_agg.rs:125-159 (as doubles)."""
    idf = F.log(
        (F.lit(float(corpus_size)) - term_freq + F.lit(0.5)) / (term_freq + F.lit(0.5))
        + F.lit(1.0)
    )
    fq = fq.cast("double")
    return idf * (
        (fq * F.lit(k1 + 1.0))
        / (fq + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len.cast("double") / F.lit(avg_doc_len)))
    )


def search_bm25(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    limit: int = 10,
    k1: float = K1,
    b: float = B,
    stem: bool = False,
    stopwords: list[str] | None = STOPWORDS,
    postings: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
    join_content: bool = False,
    round_scores: int | None = None,
    terms_col: str | None = None,
    q_terms: list[str] | None = None,
) -> DataFrame:
    """Top-``limit`` docs for ``query`` by BM25 (search_bm25 analogue).

    Builds postings on the fly unless a prebuilt ``postings`` (+``stats``)
    pair is passed. ``round_scores`` orders on the rounded score with a
    doc_id tie-break, making results exactly reproducible across engines.
    For a custom tokenization profile (e.g. the reference's ``tsvector``
    engine), pre-tokenize the corpus into ``terms_col`` and pass the
    matching ``q_terms`` — both sides of the index must use one tokenizer.
    """
    if q_terms is None:
        q_terms = sorted(set(tokenize_py(query, stopwords=stopwords, stem=stem)))
    else:
        q_terms = sorted(set(q_terms))
    if not q_terms:
        raise ValueError("query has no terms after tokenization")
    if postings is None:
        postings = build_postings(
            docs, id_col, text_col, terms_col=terms_col, stem=stem, stopwords=stopwords
        )
    if stats is None:
        n, avgdl = corpus_stats(
            docs, text_col, terms_col=terms_col, stem=stem, stopwords=stopwords
        )
    else:
        n, avgdl = stats

    hits = postings.filter(F.col("term").isin(q_terms))
    per_doc = hits.select(
        "term",
        "term_freq",
        F.explode(F.arrays_zip("doc_ids", "fqs", "doc_lens")).alias("p"),
    ).select(
        F.col("p.doc_ids").alias("doc_id"),
        bm25_score_expr(
            F.col("p.fqs"), F.col("p.doc_lens"), F.col("term_freq"), n, avgdl, k1, b
        ).alias("score"),
    )
    scored = per_doc.groupBy("doc_id").agg(F.sum("score").alias("bm25"))
    if round_scores is not None:
        scored = scored.withColumn("bm25", F.round("bm25", round_scores))
    out = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(limit)
    if join_content:
        out = out.join(
            docs.withColumnRenamed(id_col, "doc_id"), on="doc_id", how="left"
        ).orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return out


# below this postings size the batch term-union probe job costs more
# than the isin pushdown saves: the equi-join alone restricts the output
# identically, and probing a small (cached bench-sized) postings table
# buys nothing a hash join doesn't already do. Catalyst's size estimate
# is read driver-side — no job.
_PRUNE_PROBE_MIN_BYTES = 64 << 20


def _postings_worth_probe(postings: DataFrame) -> bool:
    try:
        stats = postings._jdf.queryExecution().optimizedPlan().stats()
        return float(str(stats.sizeInBytes())) >= _PRUNE_PROBE_MIN_BYTES
    except Exception:  # stats unavailable → keep the probe (scale-safe)
        return True


def search_bm25_df(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "query",
    limit: int = 10,
    k1: float = K1,
    b: float = B,
    stem: bool = False,
    stopwords: list[str] | None = STOPWORDS,
    postings: DataFrame | None = None,
    stats: tuple[int, float] | None = None,
    round_scores: int | None = None,
    terms_col: str | None = None,
    q_terms_col: str | None = None,
    prune_terms: int | None = 8192,
    unique_q_ids: bool = False,
) -> DataFrame:
    """Per-query BM25 top-``limit`` for a whole DataFrame of queries in
    ONE distributed job — the batch recast of :func:`search_bm25`, same
    shape as the ANN batch forms (``ivf_search_df``): a retrieval-eval
    or hard-negative-mining pass at 100 TB is 10^5–10^6 queries, and a
    per-query driver loop re-plans and re-scans per query.

    Plan, and why each stage holds at scale:

    1. Queries tokenize JVM-side (same ``tokenize`` expression the
       postings build uses — one tokenizer per index, the
       single-query form's contract) and explode to DISTINCT
       (q_id, term) pairs. Queries with zero post-filter terms drop
       (the single-query form raises; a batch can't).
    2. ``prune_terms``: when a limit-capped probe shows the batch's
       distinct-term union is small (≤ the cap), it collects into a
       static ``isin`` the postings scan can push down — the batch twin
       of the single-query ``term IN (...)`` filter. Past the cap the
       inner equi-join alone restricts (full postings scan, but the
       join output is identical); ``None`` skips the probe.
    3. One equi-join postings ⋈ query-terms on term (AQE broadcasts the
       smaller side), THEN the posting arrays explode — so each
       (q_id, term) hit pays exactly its posting-list length, the same
       row count the single-query form explodes, summed over the batch.
    4. groupBy (q_id, doc_id) sums the per-term partials (map-side
       combine), and a per-query ``row_number`` window — rank-filtered,
       so WindowGroupLimit prunes map-side — cuts to ``limit`` rows per
       query with the (score desc, doc_id asc) tie order of the
       single-query form.

    Returns (q_id_col, doc_id, bm25). ``round_scores`` rounds BEFORE
    ranking (cross-engine reproducibility, like the single-query form).
    Pass ``q_terms_col`` (pre-tokenized array) with ``terms_col`` for a
    custom tokenization profile; reference parity: search_bm25
    (bm25_api.sql:61-104), one query per call, recast over a batch.
    Duplicate q_id VALUES are PER-ROW like every other batch surface
    (r12): an inline occurrence number over equal q_id values (one
    small window on the query side, r15 — replacing the former
    standalone detection aggregate + surrogate-checkpoint wrap, which
    cost a dedicated job on EVERY call) keys the scoring groupBy and
    the rank window per ROW, so duplicate-valued and NULL keys each
    keep their own top-k; ``unique_q_ids=True`` skips the occurrence
    column — duplicates then score as one union-of-terms query (the
    documented escape hatch)."""
    from pyspark.sql import Window

    if postings is None:
        postings = build_postings(
            docs, id_col, text_col, terms_col=terms_col, stem=stem, stopwords=stopwords
        )
    if stats is None:
        n, avgdl = corpus_stats(
            docs, text_col, terms_col=terms_col, stem=stem, stopwords=stopwords
        )
    else:
        n, avgdl = stats

    qt = (
        F.col(q_terms_col)
        if q_terms_col
        else tokenize(q_text_col, stopwords=stopwords, stem=stem)
    )
    qbase = queries.select(
        F.col(q_id_col).alias("__qid"), F.array_distinct(qt).alias("_qt")
    )
    qsel = qbase
    group_keys = ["__qid"]
    if not unique_q_ids:
        # per-ROW answer without a detection job: number each row's
        # occurrence among equal __qid values (NULLs form one window
        # group, so NULL-keyed rows are numbered apart too — the former
        # wrap's guarantee). The order key is the tokenized payload:
        # deterministic across retries for distinct payloads, and rows
        # with identical (qid, terms) are interchangeable (identical
        # top-k), so the output multiset is retry-stable either way
        # (guide §2.5 deterministic-keys rule). One narrow exchange of
        # the (small) query frame replaces the standalone aggregate job
        # the old check paid on every call, plus the eager
        # localCheckpoint + restore join of the wrap on the dup path.
        w_occ = Window.partitionBy("__qid").orderBy("_qt")
        qsel = qsel.withColumn("__occ", F.row_number().over(w_occ))
        group_keys = ["__qid", "__occ"]
    qterms = explode_nonempty(qsel, "_qt", "term", *group_keys)

    hits = postings
    if prune_terms is not None and _postings_worth_probe(postings):
        # limit-capped probe, never an unbounded collect: the distinct
        # term union is vocabulary-bounded, but only a small union is
        # worth turning into a scan-pushable isin. Built from the
        # window-free projection — the probe job must not pay the
        # occurrence window's exchange just to list distinct terms.
        probe = [
            r["term"]
            for r in explode_nonempty(qbase.select("_qt"), "_qt", "term")
            .select("term").distinct().limit(prune_terms + 1).collect()
        ]
        if len(probe) <= prune_terms:
            hits = hits.filter(F.col("term").isin(probe))

    pairs = hits.join(qterms, on="term")
    per_doc = pairs.select(
        *group_keys,
        "term_freq",
        F.explode(F.arrays_zip("doc_ids", "fqs", "doc_lens")).alias("p"),
    ).select(
        *group_keys,
        F.col("p.doc_ids").alias("doc_id"),
        bm25_score_expr(
            F.col("p.fqs"), F.col("p.doc_lens"), F.col("term_freq"), n, avgdl, k1, b
        ).alias("score"),
    )
    scored = per_doc.groupBy(*group_keys, "doc_id").agg(F.sum("score").alias("bm25"))
    if round_scores is not None:
        scored = scored.withColumn("bm25", F.round("bm25", round_scores))
    w = Window.partitionBy(*group_keys).orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .select(F.col("__qid").alias(q_id_col), "doc_id", "bm25")
    )


def bm25_score(
    postings: DataFrame,
    stats: tuple[int, float],
    document: str,
    query: str,
    k1: float = K1,
    b: float = B,
    stem: bool = False,
    stopwords: list[str] | None = STOPWORDS,
) -> float:
    """Score an AD-HOC document (not necessarily in the corpus) against the
    corpus statistics — ``bm25_score(table, document, query)``
    (lantern_extras/src/bm25_agg.rs:61-122): term frequencies come from the
    document itself, idf from the corpus postings, doc_len from the
    document, avgdl from the corpus.

    Driver-side by design: one document, |query| postings-row lookups.
    """
    n, avgdl = stats
    q_terms = sorted(set(tokenize_py(query, stopwords=stopwords, stem=stem)))
    if not q_terms:
        return 0.0
    d_terms = tokenize_py(document, stopwords=stopwords, stem=stem)
    dl = len(d_terms)
    if dl == 0:
        return 0.0
    fq = {t: d_terms.count(t) for t in q_terms if t in d_terms}
    if not fq:
        return 0.0
    tf_rows = (
        postings.filter(F.col("term").isin(list(fq)))
        .select("term", "term_freq")
        .collect()
    )
    tfreq = {r["term"]: r["term_freq"] for r in tf_rows}
    import math

    score = 0.0
    for t, f in fq.items():
        tf = tfreq.get(t, 0)
        idf = math.log((n - tf + 0.5) / (tf + 0.5) + 1.0)
        score += idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl / avgdl))
    return score


def consolidate_postings(postings: DataFrame) -> DataFrame:
    """Re-merge duplicate term rows after incremental appends
    (consolidate_bm25_table analogue, bm25_api.sql:108-159). In Spark this
    is just re-aggregation of the exploded postings."""
    return (
        postings.select(
            "term", F.explode(F.arrays_zip("doc_ids", "fqs", "doc_lens")).alias("p")
        )
        .select(
            "term",
            F.col("p.doc_ids").alias("doc_id"),
            F.col("p.fqs").alias("fq"),
            F.col("p.doc_lens").alias("doc_len"),
        )
        .groupBy("term", "doc_id")
        .agg(F.sum("fq").cast("int").alias("fq"), F.max("doc_len").cast("int").alias("doc_len"))
        .groupBy("term")
        .agg(
            F.count("*").cast("int").alias("term_freq"),
            F.sort_array(F.collect_list(F.struct("doc_id", "fq", "doc_len"))).alias("z"),
        )
        .select(
            "term",
            "term_freq",
            F.col("term_freq").alias("doc_ids_len"),
            F.col("z.doc_id").alias("doc_ids"),
            F.col("z.fq").alias("fqs"),
            F.col("z.doc_len").alias("doc_lens"),
        )
    )
