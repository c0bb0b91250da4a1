"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its dedup-adjacent machinery is the
DISTINCT ON in hybrid search, lantern.sql:800); these extend the engine
for LLM-data curation per the build plan (SURVEY §7.8). Five tiers:

- exact: hash groupBy on content (or any column set);
- n-gram Jaccard: exact set similarity via a shingle inverted-index
  self-join — no cross join, scales as Σ posting² per shingle;
- MinHash + LSH: signature = per-hash-seed min over shingles (pure
  Catalyst — ``F.hash(shingle, seed)`` is JVM murmur); banding buckets
  candidate pairs, exact Jaccard verifies; the standard 100 TB dedup path;
- SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dup =
  small hamming distance, candidates via pigeonhole band join;
- embedding cosine: semantic near-dup via threshold self-join (brute for
  oracle-checkable small scale; random-hyperplane LSH bucketing as the
  scale path).

Every pair-producing operator returns (id_a, id_b [, score]) with
id_a < id_b, deduped.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger("lanterndb_spark.dedup")

from lanterndb_spark.functions.distance import cos_dist
from lanterndb_spark.functions.text import tokenize
from lanterndb_spark.plans.shape import (
    attach_persisted,
    explode_nonempty,
    widen_partitions,
)


# ------------------------------------------------------------ exact

def exact_dedup(
    df: DataFrame, on: list[str] | str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per duplicate group (the ``keep`` extreme of id_col).
    Pure groupBy — one shuffle on the content hash at any scale."""
    on = [on] if isinstance(on, str) else on
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    keeper = df.groupBy(*on).agg(agg.alias(id_col))
    return df.join(keeper, on=on + [id_col], how="inner")


def duplicate_groups(df: DataFrame, on: list[str] | str, id_col: str) -> DataFrame:
    """(content cols, n_dups, ids) for groups with more than one row."""
    on = [on] if isinstance(on, str) else on
    return (
        df.groupBy(*on)
        .agg(
            F.count("*").cast("int").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ----------------------------------------------------------- shingles

def _grams_over(tk, n: int) -> Column:
    """n-gram expression over an already-projected token array column.

    PLAN-SHAPE RULE (measured 15x): ``tk`` must be a plain column
    reference. Element access inside the lambda re-evaluates the source
    expression per access — inlining tokenize() here turns O(len) work
    into O(len²) interpreted re-evaluation."""
    if n == 1:
        return F.array_distinct(tk)
    idx = F.sequence(F.lit(0), F.greatest(F.size(tk) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[tk[i + j] for j in range(n)])
    )
    return F.array_distinct(
        F.when(F.size(tk) >= n, grams).otherwise(
            F.when(F.size(tk) > 0, F.array(F.array_join(tk, " "))).otherwise(
                F.array().cast("array<string>")
            )
        )
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, sh array<string>): tokenize projected first, then n-grams over
    the column reference — the fast two-step plan every operator here uses."""
    return (
        widen_partitions(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt")))
        .select("id", tokenize("_txt", stopwords=None).alias("tk"))
        .select("id", _grams_over(F.col("tk"), n).alias("sh"))
    )


def word_shingles(col, n: int = 3) -> Column:
    """Distinct word n-grams of the tokenized text (array<string>).

    Column-level convenience for tests/small data; operators use
    :func:`shingle_table` (see _grams_over's plan-shape rule — this inline
    form re-evaluates tokenize per element access)."""
    return _grams_over(tokenize(col, stopwords=None), n)


# ----------------------------------------------- exact n-gram Jaccard

# Measured capped-vs-prefix crossover (tools/scale_smoke.py corpora,
# local[32]): capped inverted-index 6.4 s @ 50k docs / 170 s @ 500k;
# prefix filtering 15.1 s @ 50k / 128-145 s @ 500k — the curves cross
# between those tiers (r7 midpoint measurements recorded in DESIGN.md).
# Past this size the capped join's hot-posting shuffle is both slower
# AND recall-lossy, so jaccard_pairs auto-routes to the prefix plan.
JACCARD_PREFIX_CROSSOVER = 100_000


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int | None = 10_000,
    exact: bool = False,
) -> DataFrame:
    """All pairs with Jaccard(shingles_a, shingles_b) >= threshold, via
    shingle inverted-index self-join (explode → join on shingle → count
    common → |A|+|B|-common). No cross join: cost is bounded by posting
    list sizes.

    ``max_posting`` bounds the self-join fan-out: a shingle shared by p
    docs contributes p² candidate rows, so one boilerplate shingle shared
    by 10⁶ docs alone would emit 10¹² rows. Shingles whose posting list
    exceeds the cap are dropped from the JOIN ONLY (set sizes keep them),
    mirroring BM25's hot-term threshold. The cap is precision-preserving
    (scores only drop, never rise) but NOT recall-preserving: a pair
    whose overlap is concentrated in hot shingles can fall below the
    threshold entirely (measured on a synthetic boilerplate-heavy corpus
    in tools/scale_smoke.py — capped exact found 0 of the pairs
    MinHash-LSH verified). On corpora where near-dups share mostly
    ultra-common shingles, use minhash_lsh_pairs (banding doesn't care
    about per-shingle frequency). None disables the cap (exact oracle
    mode).

    AUTO-ROUTING: past ``JACCARD_PREFIX_CROSSOVER`` docs (one cheap
    count), the call routes to :func:`jaccard_pairs_prefix` — identical
    (id_a, id_b, jaccard) schema, recall-LOSSLESS (it returns the full
    uncapped answer, a superset of what the capped join would emit), and
    measured faster at that size. ``exact=True`` pins this inverted-index
    plan regardless of corpus size (the escape hatch for oracles and
    plan-pinned tests)."""
    # limit-capped probe (same idiom as embedding_near_dup_pairs's
    # auto_brute_limit): the route decision needs "more than CROSSOVER
    # rows?", never the exact count — a full count() would scan 100 TB
    # just to pick a plan
    if (
        not exact
        and df.limit(JACCARD_PREFIX_CROSSOVER + 1).count()
        > JACCARD_PREFIX_CROSSOVER
    ):
        return jaccard_pairs_prefix(df, id_col, text_col, n, threshold)
    # persist: the shingle expression is referenced by BOTH sides of the
    # self-join below; higher-order-function exprs don't enter whole-stage
    # codegen, so re-evaluating them per branch is the dominant cost. At
    # cluster scale this materialization is the classic "write the shingle
    # table once, join against it" pattern.
    sh = (
        shingle_table(df, id_col, text_col, n)
        .withColumn("sz", F.size("sh"))
        .persist()
    )
    sizes = sh.select("id", "sz")
    ex = explode_nonempty(sh, "sh", "g", "id")
    if max_posting is not None:
        # hot shingles are few by definition → broadcast anti-join; the
        # posting count is a map-side-combined groupBy (cheap at scale)
        hot = (
            ex.groupBy("g")
            .agg(F.count("*").alias("__pc"))
            .filter(F.col("__pc") > max_posting)
            .select("g")
        )
        ex = ex.join(F.broadcast(hot), on="g", how="left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
    return attach_persisted(out, sh)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = 10_000,
) -> DataFrame:
    """DIRECTED near-subset pairs: containment(A in B) = |A∩B| / |A| >=
    ``threshold``, emitted as ``(id_sub, id_super, containment)``. Catches
    the sub-document duplication symmetric Jaccard structurally misses: a
    short doc fully quoted inside a long one has J ≈ |A|/|B| → 0 but
    containment(A in B) = 1. Complements :func:`~lanterndb_spark.
    operators.spans.repeated_spans` (span-level) at the whole-document
    grain.

    Same inverted-index shape as :func:`jaccard_pairs` — the symmetric
    intersection is counted ONCE per unordered pair and both directions
    are derived from it, so the directed output costs no extra join.
    ``max_posting`` carries jaccard_pairs' cap and its recall caveat.
    Prefix filtering does NOT transfer (containment has no length lower
    bound: any tiny subset passes, so there is no prefix pigeonhole) —
    for exact recall run uncapped, or at corpus scale screen candidates
    with minhash_lsh_pairs at a low threshold first."""
    sh = (
        shingle_table(df, id_col, text_col, n)
        .withColumn("sz", F.size("sh"))
        .persist()
    )
    sizes = sh.select("id", "sz")
    ex = explode_nonempty(sh, "sh", "g", "id")
    if max_posting is not None:
        hot = (
            ex.groupBy("g")
            .agg(F.count("*").alias("__pc"))
            .filter(F.col("__pc") > max_posting)
            .select("g")
        )
        ex = ex.join(F.broadcast(hot), on="g", how="left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sized = common.join(
        sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a"
    ).join(
        sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b"
    )
    fwd = sized.select(
        F.col("id_a").alias("id_sub"),
        F.col("id_b").alias("id_super"),
        (F.col("common").cast("double") / F.col("sz_a").cast("double")).alias(
            "containment"
        ),
    )
    rev = sized.select(
        F.col("id_b").alias("id_sub"),
        F.col("id_a").alias("id_super"),
        (F.col("common").cast("double") / F.col("sz_b").cast("double")).alias(
            "containment"
        ),
    )
    out = fwd.unionByName(rev).filter(
        F.col("containment") >= F.lit(float(threshold))
    )
    return attach_persisted(out, sh)


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with Jaccard >= threshold via PREFIX FILTERING
    (SSJoin/All-Pairs/PPJoin family) — exact AND recall-preserving, the
    principled fix for :func:`jaccard_pairs`' ``max_posting`` recall gap.

    Order every shingle by global corpus frequency (rarest first,
    shingle-string tiebreak for determinism). A doc with ``sz`` shingles
    indexes only its PREFIX — the first ``sz - ceil(t*sz) + 1`` in that
    order: two sets with Jaccard >= t must share at least one prefix
    token (pigeonhole on the required overlap ``>= ceil(t*|x|)``), so
    joining on prefix tokens alone loses no true pair. Candidates also
    pass the length filter ``min(sz) >= t * max(sz)`` (necessary for
    J >= t), then exact verification on the full shingle arrays.

    Why this is the 100 TB shape: boilerplate shingles are by definition
    FREQUENT, so they sort to the END of the global order and never enter
    a prefix — the quadratic hot-posting cliff that ``max_posting``
    truncates (dropping recall) is pruned here by construction, exactly.
    Candidate volume is bounded by rare-token posting lists. Cost: one
    shuffle on shingle (frequency join), one on id (per-doc sort), the
    prefix self-join, and the verify join — each key-uniform.

    (The positional-filter refinement of full PPJoin — upper-bounding
    overlap from prefix positions — is omitted: it trims candidates by a
    constant factor at the price of a wider index; the length + prefix
    filters already remove the asymptotic cliff.)
    """
    t = float(threshold)
    sh = (
        shingle_table(df, id_col, text_col, n)
        .withColumn("sz", F.size("sh"))
        .filter(F.col("sz") > 0)
        .persist()
    )
    ex = explode_nonempty(sh.select("id", "sh"), "sh", "g", "id")
    freq = ex.groupBy("g").agg(F.count("*").alias("fc"))
    # per-doc shingles sorted by (global freq asc, shingle asc): one
    # shuffle on g to attach counts, one on id to assemble the order
    per_doc = (
        ex.join(freq, "g")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("fc", "g"))).alias("srt"))
        .join(sh.select("id", "sz"), "id")
    )
    plen = (F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1).cast("int")
    pex = per_doc.select(
        "id", "sz",
        F.explode(
            F.slice(F.transform("srt", lambda s: s["g"]), F.lit(1), plen)
        ).alias("g"),
    )
    a, b = pex.alias("a"), pex.alias("b")
    cand = (
        a.join(b, on="g")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.least("a.sz", "b.sz")
               >= F.lit(t) * F.greatest("a.sz", "b.sz"))
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    out = (
        cand.join(sh.select(F.col("id").alias("id_a"),
                            F.col("sh").alias("sh_a"),
                            F.col("sz").alias("sz_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"),
                        F.col("sh").alias("sh_b"),
                        F.col("sz").alias("sz_b")), "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(t))
        .select("id_a", "id_b", "jaccard")
    )
    return attach_persisted(out, sh)


# --------------------------------------------------------- MinHash LSH

def _mix_sql(i: int) -> str:
    """SQL text of the KM + xorshift64 mix for coordinate ``i`` over the
    ``h1``/``h2`` murmur columns (see _minhash_wide for the derivation)."""
    v = f"(h1 + {i}L * h2)"
    v = f"({v} ^ shiftleft({v}, 13))"
    v = f"({v} ^ shiftrightunsigned({v}, 7))"
    return f"({v} ^ shiftleft({v}, 17))"


def _minhash_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    n: int,
    sh_df: DataFrame | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{H-1}) via explode + groupBy of seeded murmur mins.

    This shape matters: expressing the signature as array_min over
    higher-order-function lambdas keeps the whole expression OUT of
    whole-stage codegen (HOFs are interpreted) — measured ~10x slower.
    explode + ``min(hash(g, seed))`` aggregates are fully codegen'd AND
    get map-side partial aggregation (min is associative), so the shuffle
    carries one row per (doc, 64 ints) — the standard distributed MinHash.

    ``sh_df``: an already-built (id, sh) shingle table to aggregate from
    instead of re-tokenizing ``df`` — callers that also need the shingle
    arrays later (the corpus-scope exact verify) persist ONE table and
    feed both consumers from it."""
    ex = explode_nonempty(
        sh_df if sh_df is not None else shingle_table(df, id_col, text_col, n),
        "sh", "g", "id",
    )
    # Kirsch-Mitzenmacher double hashing: h_i(g) = h1(g) + i*h2(g) gives an
    # adequate minhash family from TWO murmur evaluations per shingle —
    # keeps the generated aggregate code small (64 ints of arithmetic
    # instead of 64 full hash calls; cuts one-time codegen JIT cost too)
    ex = ex.select(
        "id",
        # bigint: i*h2 would overflow int32 and ANSI mode (Spark 4 default)
        # raises on overflow; in 64-bit the products stay well in range
        F.hash("g", F.lit(0)).cast("bigint").alias("h1"),
        F.hash("g", F.lit(1)).cast("bigint").alias("h2"),
    )
    # xorshift64 avalanche on top of the linear KM stream: argmin_g of the
    # RAW h1 + i*h2 converges to the min-h2 shingle as i grows, so a single
    # shared low-h2 shingle makes near-disjoint docs agree on almost every
    # coordinate (measured: estimate 63/64 at exact Jaccard 0.007 — fatal
    # for verify="estimate"). The avalanche re-ranks the argmin pseudo-
    # independently per i while keeping TWO murmur evaluations per shingle;
    # bitwise shift/xor only, so no ANSI-mode overflow surface and the
    # whole aggregate stays in codegen. Identical shingle sets still map to
    # identical signatures (the mix is deterministic), so twin pairs keep
    # estimated Jaccard exactly 1.0.
    #
    # The 64 mix chains are built as SQL strings parsed in ONE JVM call
    # each (r14): constructing them through the Column DSL cost 1.5-2.4 s
    # of py4j round-trips per call (~10 proxy objects x 64 coordinates) —
    # pure driver-side overhead (guide §5 "very large query plans" / §7.3
    # "gigantic expression trees in loops"). The parsed tree is the same
    # expression (measured: identical results AND identical stage times;
    # the repeated sub-expression text is deduplicated by codegen CSE
    # exactly like the DSL's shared Column subtree was).
    aggs = [F.expr(f"min({_mix_sql(i)}) AS mh_{i}") for i in range(num_hashes)]
    return ex.groupBy("id").agg(*aggs)


def _sig_array_expr(num_hashes: int) -> Column:
    """``array(mh_0, ..., mh_{H-1}) AS sig`` parsed in one JVM call (r14
    py4j-chatter rule, see _minhash_wide)."""
    return F.expr(
        "array(" + ", ".join(f"mh_{i}" for i in range(num_hashes)) + ") AS sig"
    )


def _band_explode_expr(num_hashes: int, bands: int, fmt: str) -> Column:
    """``explode(array(struct(b AS band, hash(<fmt(i)>...) AS bh), ...))``
    parsed in one JVM call; ``fmt`` maps a flat coordinate index to the
    SQL text of that coordinate (wide column or array element), so the
    fresh-build and stored-signature banders share one (bit-identical)
    band-hash construction."""
    r = num_hashes // bands
    return F.expr(
        "explode(array(" + ", ".join(
            f"struct({bi} AS band, hash("
            + ", ".join(fmt.format(i=bi * r + j) for j in range(r))
            + ") AS bh)"
            for bi in range(bands)
        ) + ")) AS s"
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, n: int = 3
) -> DataFrame:
    """(id, sig array<int>). Docs with zero shingles drop out (a token-less
    doc cannot near-duplicate anything)."""
    wide = _minhash_wide(df, id_col, text_col, num_hashes, n)
    return wide.select("id", _sig_array_expr(num_hashes))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    verify: bool | str = True,
    auto_estimate_threshold: int = 200_000,
    max_bucket: int | None = 1_000,
    verify_scope: str = "auto",
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH.

    bands×rows = num_hashes; a pair lands in a candidate bucket if any
    band of its signatures matches exactly (P ≈ 1-(1-j^r)^b). Candidate
    verification modes:

    - ``verify=True`` / ``"exact"``: join shingle sets back, exact
      Jaccard ≥ threshold — full precision. ``verify_scope`` picks how
      the shingles reach the join: ``"corpus"`` re-tokenizes the whole
      input in one streaming pass — zero extra jobs, the right trade for
      small corpora; ``"candidates"`` — a broadcast semi-join on the
      candidate ids prunes the re-scan so the verify join touches a
      candidate-sized shingle table, never a corpus-sized one (true
      near-dups are sparse), the right trade at scale where the
      semi-join's fixed overhead is nothing against a full second pass;
      ``"auto"`` (default) picks by the measured ~20k-doc crossover
      (DESIGN.md round 5) using one cheap count over the persisted
      signatures.
    - ``verify="estimate"``: estimated Jaccard = fraction of agreeing
      minhash coordinates — zero extra joins (signatures are already in
      hand from banding), stderr ≈ 1/√num_hashes (~0.125 at 64). The
      scale mode when the verify join dominates (a corpus with tens of
      millions of true near-dup pairs).
    - ``verify="auto"``: count candidates (one cheap job over the already
      persisted banding output) and pick exact below
      ``auto_estimate_threshold`` pairs, estimate above — the crossover is
      where the pairs×shingles verify join starts to dominate the build.
    - ``verify=False``: raw candidates.

    ``max_bucket`` bounds the self-join fan-out (the one quadratic cliff
    in banded LSH): a band bucket with p members emits p(p-1)/2 candidate
    rows, so a boilerplate blob duplicated 10⁶ times would alone emit
    ~5·10¹¹ rows per band. Buckets over the cap switch from all-pairs to
    a STAR on the bucket's minimum id (p-1 rows) — connectivity inside
    the bucket is preserved exactly (every member still reaches every
    other through the hub, so connected-components resolution, the
    downstream consumer in near_dup_keep, is unaffected for true
    duplicate groups, whose star edges all pass verification), but
    non-hub pair rows of a hot bucket are not emitted individually. Set
    ``max_bucket=None`` for exhaustive pair lists (oracle mode). The
    hot/cold split is computed inline by a (band, bh) window (r14) —
    direct pair-list consumers that need to know whether any bucket
    tripped the cap should compare ``size >= 2`` bucket counts against
    ``max_bucket`` themselves (the former eager warning cost a
    dedicated aggregate job on every call).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    # signature-needing verify modes (estimate, and auto which may pick
    # estimate) cache the 64-column signature table — estimate reads it
    # back per pair. Pure exact/candidate modes cache only the NARROW
    # banded projection instead (r14): the hot-check job and both
    # self-join branches re-read (id, band, bh), caching 3 small columns
    # is materially cheaper than 64 bigints, and the 16-struct band
    # explode is computed once instead of once per cache reader (the
    # signature aggregation still runs exactly once either way — it is
    # upstream of whichever frame persists).
    needs_sigs = verify in ("estimate", "auto")
    sh_shared = None
    if verify in (True, "exact") and verify_scope == "auto":
        # resolve the scope NOW from the input row count (results are
        # scope-invariant, the threshold only picks a plan) so a
        # corpus-scope run can share ONE persisted shingle table
        # between the signature build and the verify join instead of
        # re-tokenizing the corpus twice. The candidates scope (the
        # 100 TB path) never persists a corpus-sized shingle table.
        # Catalyst's row estimate (driver-side, no job — exact for a
        # materialized cache) answers first; only an estimate-less
        # input pays the column-pruned count job.
        from lanterndb_spark.plans.shape import estimated_rows

        n_rows = estimated_rows(df)
        if n_rows is None:
            n_rows = df.count()
        verify_scope = "candidates" if n_rows >= 20_000 else "corpus"
    if verify in (True, "exact") and verify_scope == "corpus":
        sh_shared = shingle_table(df, id_col, text_col, n).persist()
    wide = _minhash_wide(df, id_col, text_col, num_hashes, n, sh_df=sh_shared)
    if needs_sigs:
        # persist before the self-join so the signature aggregation runs
        # once, not once per join branch (at cluster scale: write the
        # signature table, then join against it)
        wide = wide.persist()
    banded = wide.select(
        "id", _band_explode_expr(num_hashes, bands, "mh_{i}")
    ).select("id", "s.band", "s.bh")
    star = None
    if max_bucket is not None:
        # hot-bucket handling WITHOUT the former decide-then-branch
        # aggregate job (r14; it cost a dedicated pass over the banded
        # projection on EVERY call — ~0.9 s at bench scale — to decide a
        # plan shape): one (band, bh) window computes each row's bucket
        # size and hub (min id) inline. WindowExec buffers per-group
        # rows in a spillable array, so a boilerplate mega-bucket
        # streams through one task exactly like the old semi-join
        # funnel did — the memory bound is unchanged. Rows of cold
        # buckets (≤ max_bucket) take the exact all-pairs self-join;
        # rows of hot buckets emit hub-star edges, identical to the old
        # split. The join on (band, bh) sits directly on the window's
        # hash partitioning, so no additional exchange enters the plan.
        # (The former eager hot-bucket log went with the decision job —
        # non-exhaustiveness inside hot buckets is the documented
        # max_bucket contract; set max_bucket=None for exhaustive
        # pairs.)
        from pyspark.sql import Window as _W

        wspec = _W.partitionBy("band", "bh")
        banded = banded.withColumn(
            "__bc", F.count(F.lit(1)).over(wspec)
        ).withColumn("__hub", F.min("id").over(wspec))
    if not needs_sigs:
        banded = banded.persist()
    persisted = [wide] if needs_sigs else [banded]
    if sh_shared is not None:
        persisted.append(sh_shared)
    if max_bucket is not None:
        cold_side = banded.filter(F.col("__bc") <= max_bucket)
        star = (
            banded.filter(
                (F.col("__bc") > max_bucket) & (F.col("id") != F.col("__hub"))
            )
            .select(F.col("__hub").alias("id_a"), F.col("id").alias("id_b"))
        )
    else:
        cold_side = banded
    a, b = cold_side.alias("a"), cold_side.alias("b")
    cand = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    if star is not None:
        cand = cand.unionByName(star)  # hub id is the min → id_a < id_b holds
    cand = cand.distinct()
    if not verify:
        return attach_persisted(cand, *persisted)
    if verify == "auto":
        cand = cand.persist()
        verify = "exact" if cand.count() <= auto_estimate_threshold else "estimate"
    if verify == "estimate":
        sig = wide.select("id", _sig_array_expr(num_hashes))
        out = (
            cand.join(sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
            .join(sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
            .withColumn(
                "jaccard",
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                ).cast("double")
                / F.lit(float(num_hashes)),
            )
            .filter(F.col("jaccard") >= F.lit(float(threshold)))
            .select("id_a", "id_b", "jaccard")
        )
        return attach_persisted(out, *persisted, cand)
    if verify_scope == "auto":
        # measured crossover (DESIGN.md round 5): corpus-scope wins at
        # 5k docs (3.3 vs 4.0 s — the semi-join's fixed overhead
        # dominates), candidates-scope wins from ~50k (7.4 vs 13.0 s at
        # 50k; 15.7 vs 24.3 s at 500k). The doc count is one cheap job
        # over the already-persisted signature projection.
        verify_scope = "candidates" if wide.count() >= 20_000 else "corpus"
    if verify_scope == "candidates":
        # re-shingle ONLY the docs that appear in a candidate pair. True
        # near-dups are sparse, so |candidate docs| << |corpus|;
        # re-tokenizing that sliver (a semi-join-pruned second scan) is
        # far cheaper at cluster scale than shuffling a corpus-sized
        # shingle table through the verify join. The price is fixed: one
        # broadcast subquery + one extra (pruned) scan — measured ~2 s of
        # job overhead regardless of data size, which is why small-corpus
        # callers get "corpus" scope instead.
        cand = cand.persist()
        cand_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .unionByName(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        sh = shingle_table(
            df.join(F.broadcast(cand_ids), on=id_col, how="left_semi"),
            id_col, text_col, n,
        )
    else:
        # corpus scope: the persisted shingle table built above already
        # fed the signature aggregation — the verify join reads the SAME
        # cache, so the corpus tokenizes once per call, not twice (r14;
        # corpus scope only triggers under the ~20k-doc crossover, so
        # the cache is bounded small). Ad-hoc callers that forced
        # scope="corpus" with a non-exact verify fall back to the
        # streaming re-tokenize pass.
        sh = sh_shared if sh_shared is not None else shingle_table(
            df, id_col, text_col, n)
    out = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
    return attach_persisted(out, *persisted, cand)


def _band_sig_array(sig_df: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bh) from an (id, sig array<bigint>) signature table.

    Produces bit-identical band hashes to the wide-column banding inside
    :func:`minhash_lsh_pairs` (``F.hash`` is value-based), so band keys
    from a stored signature table and keys from a fresh build collide
    exactly when the underlying signatures match."""
    return sig_df.select(
        "id", _band_explode_expr(num_hashes, bands, "sig[{i}]")
    ).select("id", "s.band", "s.bh")


def minhash_lsh_incremental(
    corpus_sigs: DataFrame,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 1_000,
    broadcast_new: bool | None = None,
) -> DataFrame:
    """Near-dup pairs for a NEW document batch against an already-signed
    corpus — the production dedup shape at ingest time: the corpus text is
    never re-read, re-tokenized, or re-self-joined; only its stored
    ``minhash_signatures`` output (id, sig) participates, and the corpus
    side of the candidate join is a semi-bounded lookup keyed on the new
    batch's band keys.

    Emits (id_a, id_b, jaccard) for new-vs-corpus pairs (id_a = corpus
    doc) AND new-vs-new pairs (id_a < id_b within the batch), estimated
    from signature agreement (stderr ~1/sqrt(num_hashes)) — the same
    ``verify="estimate"`` semantics as :func:`minhash_lsh_pairs`, which is
    the documented scale mode; running exact Jaccard against corpus docs
    would require re-reading their text, defeating the point. Against a
    full fresh run over old+new with estimate verification and the same
    parameters, the result is exactly the subset of pairs touching a new
    doc (band hashes are value-based, so stored and fresh signatures
    collide identically) — pinned by the ``minhash_incremental_invariants``
    driver oracle.

    Scale shape: the new batch is signed once (explode + map-side-combined
    min aggregates), banded, and — when small, the common ingest case,
    controlled by ``broadcast_new`` (None = auto at <=100k band rows) —
    BROADCAST into the corpus banding, so the corpus signature table
    streams through the join map-side with zero shuffle. ``max_bucket``
    caps boilerplate band buckets on the corpus side (keep the
    ``max_bucket`` smallest ids; hot buckets are located with one
    map-side-combined count and only those rows pay a ranking window),
    bounding the per-new-doc fan-out; a warning logs when the cap
    engages, mirroring :func:`minhash_lsh_pairs`.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    new_sigs = minhash_signatures(new_docs, id_col, text_col, num_hashes, n).persist()
    nb = _band_sig_array(new_sigs, num_hashes, bands)
    cb = _band_sig_array(corpus_sigs, num_hashes, bands)
    if max_bucket is not None:
        hot_keys_df = (
            cb.groupBy("band", "bh")
            .agg(F.count("*").alias("__bc"))
            .filter(F.col("__bc") > max_bucket)
            .select("band", "bh")
        )
        if hot_keys_df.limit(1).count():
            _log.warning(
                "minhash_lsh_incremental: corpus band bucket(s) over "
                "max_bucket=%d — hot buckets are truncated to their %d "
                "smallest ids (per-new-doc fan-out bound; set "
                "max_bucket=None for exhaustive matching)",
                max_bucket, max_bucket,
            )
            from pyspark.sql.window import Window

            hot_keys = F.broadcast(hot_keys_df)
            cold = cb.join(hot_keys, ["band", "bh"], "left_anti")
            capped = (
                cb.join(hot_keys, ["band", "bh"], "left_semi")
                .withColumn(
                    "__rn",
                    F.row_number().over(
                        Window.partitionBy("band", "bh").orderBy("id")
                    ),
                )
                .filter(F.col("__rn") <= max_bucket)
                .drop("__rn")
            )
            cb = cold.unionByName(capped)
    if broadcast_new is None:
        broadcast_new = new_sigs.count() * bands <= 100_000
    nb_join = F.broadcast(nb) if broadcast_new else nb
    new_old = (
        cb.alias("c")
        .join(nb_join.alias("nw"), on=["band", "bh"])
        .filter(F.col("c.id") != F.col("nw.id"))
        .select(F.col("c.id").alias("id_a"), F.col("nw.id").alias("id_b"))
    )
    a, b = nb.alias("a"), nb.alias("b")
    new_new = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cand = new_old.unionByName(new_new).distinct()
    sig_all = corpus_sigs.select("id", "sig").unionByName(new_sigs.select("id", "sig"))
    out = (
        cand.join(
            sig_all.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
        )
        .join(
            F.broadcast(new_sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")))
            if broadcast_new
            else new_sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(
                F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
            ).cast("double")
            / F.lit(float(num_hashes)),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
    return attach_persisted(out, new_sigs)


# ------------------------------------------------------------ SimHash

def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, fp bigint): explode tokens → 64-bit token hash (two seeded
    murmurs) → per-bit ±1 vote SUM aggregates → sign bits packed into a
    bigint.

    Same plan-shape rule as _minhash_wide: sum aggregates over exploded
    tokens are codegen'd + map-side combined; the equivalent
    ``aggregate(transform(...))`` higher-order fold is interpreted and was
    ~10x slower. Token-less docs drop out."""
    ex = explode_nonempty(
        widen_partitions(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))
        ).select("id", tokenize("_txt", stopwords=None).alias("tk")),
        "tk", "t", "id",
    )
    h64 = (
        F.hash("t", F.lit(0)).cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF))
        .bitwiseOR(
            F.shiftleft(F.hash("t", F.lit(1)).cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF)), 32)
        )
    )
    ex = ex.select("id", h64.alias("h"))
    # SQL-string construction for the 64 vote aggregates and the 64-term
    # packing sum (r14): the same py4j-chatter rule as _minhash_wide —
    # ~1 000 Column proxy calls of pure driver overhead replaced by 65
    # parse calls; parsed trees are value-identical (same shift/and/sum
    # arithmetic, same left-associated packing order, so identical ANSI
    # partial sums).
    votes = ex.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS b{i}"
            )
            for i in range(bits)
        ]
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN shiftleft(1L, {i}) ELSE 0L END)"
        for i in range(bits)
    )
    return votes.select("id", F.expr(f"({fp}) AS fp"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into ``chunks``
    16-bit chunks; any pair within hamming d < chunks must agree exactly
    on ≥1 chunk → join on (chunk_id, chunk_value), verify with popcount.
    """
    width = 64 // chunks
    # persist: same self-join re-evaluation economics as minhash_lsh_pairs
    fp = simhash_fingerprints(df, id_col, text_col).persist()
    chunked = fp.select(
        "id", "fp",
        F.expr(
            "explode(array(" + ", ".join(
                f"struct({i} AS chunk,"
                f" (shiftright(fp, {i * width}) & {(1 << width) - 1}) AS cv)"
                for i in range(chunks)
            ) + ")) AS s"
        ),
    ).select("id", "fp", "s.chunk", "s.cv")
    a, b = chunked.alias("a"), chunked.alias("b")
    out = (
        a.join(b, on=["chunk", "cv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return attach_persisted(out, fp)


# ------------------------------------------- embedding cosine near-dup

def connected_components(
    pairs: DataFrame, max_iter: int = 20, checkpoint_fn=None
) -> DataFrame:
    """(id, component) for every id in a pair list — resolves near-dup
    PAIRS into GROUPS so a pipeline can keep one representative per group.

    Alternating small-star label propagation with DataFrames only: each
    iteration joins current labels onto the edges and takes the min label
    over each node's neighborhood; stops at fixpoint. Near-dup clusters
    have tiny diameters (a handful of hops), so convergence is fast; each
    iteration is one join + one groupBy at any scale. ``component`` is the
    min id of the cluster.

    LINEAGE CONTRACT (measured, tools/pipeline_demo.py): iteration must
    TRUNCATE lineage, not merely persist — a cached plan still embeds the
    full caller subtree as its cache key, so when ``pairs`` carries a deep
    pipeline (scrub → mask → classify → minhash), per-iteration plans
    nest it multiplicatively until the driver OOMs just PRINTING a plan
    tree. Eager ``localCheckpoint`` on the edges and on each label round
    keeps every iteration's plan constant-sized.

    DURABILITY: ``localCheckpoint`` blocks live only on executors — on a
    real cluster an executor loss (including dynamic-allocation
    decommission) makes them unrecoverable mid-iteration. Cluster callers
    should pass ``checkpoint_fn=lambda df: df.checkpoint(eager=True)``
    (with ``spark.sparkContext.setCheckpointDir`` pointing at reliable
    storage) to make every truncation durable; the default stays
    localCheckpoint for single-box/interactive use where it is ~10×
    cheaper and loss just means rerun.
    """
    ckpt = checkpoint_fn or (lambda df: df.localCheckpoint(eager=True))
    edges = ckpt(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # every node adopts the min component among itself + its neighbors
        nbr = (
            edges.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .select(F.col("src").alias("id"), "component")
        )
        new_labels = ckpt(
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), on="id")
            .filter(F.col("o.component") != F.col("n.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str, keep: str = "min"
) -> DataFrame:
    """Drop near-duplicates: every id appearing in ``pairs`` keeps only the
    group representative (min/max id of its connected component). Rows not
    in any pair pass through untouched — the end-to-end near-dup dedup
    step a training-data pipeline actually runs."""
    comp = connected_components(pairs)
    agg = F.min("id") if keep == "min" else F.max("id")
    reps = comp.groupBy("component").agg(agg.alias("__rep"))
    keepers = comp.join(reps, on="component").filter(F.col("id") == F.col("__rep"))
    drop = comp.join(keepers.select("id", F.lit(True).alias("__keep")), on="id", how="left_anti")
    return df.join(
        drop.select(F.col("id").alias(id_col)), on=id_col, how="left_anti"
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    max_cos_dist: float = 0.05,
    method: str = "auto",
    n_planes: int = 8,
    seed: int = 42,
    auto_brute_limit: int = 100_000,
    k_neighbors: int = 10,
    ef: int = 64,
    nprobe: int | None = None,
    index_params: dict | None = None,
    index=None,
) -> DataFrame:
    """Semantic near-dup pairs: cos_dist(a,b) <= max_cos_dist.

    method='brute': full self-join — exact, oracle-checkable, O(n²):
    fine up to ~10⁵ rows / for verification samples.
    method='ann': the SemDeDup shape — build a cos-metric HNSW graph
    over the corpus and run the corpus back through it as a
    DataFrame-native query batch (``hnsw_search_df``): each doc emits
    its ``k_neighbors`` nearest, the threshold filter keeps true pairs
    (every emitted pair is verified by its REAL cos distance, so
    precision is exact). Cost is n·log-ish instead of n² — the 100 TB
    path. Recall caveat, stated honestly: a doc in a near-dup GROUP
    larger than ``k_neighbors`` links only to its k nearest members, so
    giant groups may fragment into sub-components (same property as
    SemDeDup's per-cluster top-k); size ``k_neighbors`` at the expected
    max group size, like minhash's ``max_bucket``. With cluster routing
    (``index_params={'routing': 'cluster'}`` + ``nprobe``) query cost
    scales with nprobe, not shard count.
    method='lsh': random-hyperplane signatures bucket the join (pairs
    agreeing on all sign bits); loses recall near bucket boundaries AND
    keeps a quadratic self-join within each bucket (2^n_planes buckets —
    at 10M+ rows the per-bucket blowup returns), so 'ann' supersedes it
    as the scale path; kept for the cheap-sketch use case.
    method='auto' (default): brute below ``auto_brute_limit`` rows
    (limit-capped count — never a full count job), ann above, so callers
    who never chose get the scale-safe path when it matters.

    ``index``: a PREBUILT cos-metric HnswIndex over ``df``'s vectors
    (VERDICT r8 item 4). At 100 TB the graph build dominates the ann
    path and the corpus usually already carries a cos index
    (``LanternTable.create_index``) — passing it skips the per-call
    rebuild entirely (zero build jobs) and forces method='ann'. The
    caller keeps ownership of the index's persisted graphs (nothing is
    attached for release); correctness is unchanged because every
    emitted pair is verified by its exact rescored cos distance.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if index is not None:
        if index.metric != "cos":
            raise ValueError(
                f"embedding_near_dup_pairs needs a cos-metric index; got "
                f"{index.metric!r}"
            )
        method = "ann"
    elif method == "auto":
        small = base.limit(auto_brute_limit + 1).count() <= auto_brute_limit
        method = "brute" if small else "ann"
    if method == "ann":
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_df

        built_here = index is None
        if built_here:
            params = {"m": 16, "ef_construction": 64, "seed": seed}
            params.update(index_params or {})
            index = build_hnsw(base, "v", id_col="id", metric="cos", **params)
        queries = base.select(
            F.col("id").alias("q_id"), F.col("v").alias("query")
        )
        res = hnsw_search_df(
            # doc ids ARE the dedup key — duplicates are a caller error
            # upstream, so skip the per-call duplicate-detection count
            index, queries, k=k_neighbors, ef=ef, nprobe=nprobe,
            unique_q_ids=True,
        )
        if index.id_col != "id":  # external index keyed by the caller's id
            res = res.withColumnRenamed(index.id_col, "id")
        if getattr(index, "quant", None) not in (None, "f32", "f64"):
            # a lossy-quantized external index (f16/i8/b1/pq) emits
            # approximate distances — the threshold contract ("every
            # emitted pair verified by its exact cos distance") needs an
            # exact rescore over the n·k candidate rows before filtering
            # (cos_dist is the module-level import)
            qv = base.select(F.col("id").alias("q_id"), F.col("v").alias("__qv"))
            dv = base.select("id", F.col("v").alias("__dv"))
            res = (
                res.join(qv, on="q_id")
                .join(dv, on="id")
                .withColumn("dist", cos_dist("__qv", "__dv").cast("double"))
                .drop("__qv", "__dv")
                .filter(F.col("dist").isNotNull())
            )
        pairs = (
            res.filter(F.col("dist") <= max_cos_dist)
            .filter(F.col("q_id") != F.col("id"))
            .select(
                F.least("q_id", "id").alias("id_a"),
                F.greatest("q_id", "id").alias("id_b"),
                F.col("dist").alias("cos_dist"),
            )
            # a pair usually surfaces from both endpoints' k-NN lists;
            # the distances are identical (one exact rescore), min dedups
            .groupBy("id_a", "id_b")
            .agg(F.min("cos_dist").alias("cos_dist"))
        )
        if built_here:
            return attach_persisted(pairs, index.graphs)
        return pairs
    if method == "lsh":
        import numpy as np

        rng = np.random.default_rng(seed)
        dim = len(base.select("v").first()["v"])
        planes = rng.standard_normal((n_planes, dim))
        sig = F.concat(
            *[
                F.when(
                    F.aggregate(
                        F.zip_with(
                            F.col("v").cast("array<double>"),
                            F.array(*[F.lit(float(x)) for x in planes[p]]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0"))
                for p in range(n_planes)
            ]
        )
        base = base.withColumn("bucket", sig)
        join_on = ["bucket"]
    else:
        base = base.withColumn("bucket", F.lit(0))
        join_on = ["bucket"]
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, on=join_on)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos_dist(F.col("a.v"), F.col("b.v")).alias("cos_dist"),
        )
        .filter(F.col("cos_dist") <= F.lit(float(max_cos_dist)))
    )


def choose_bands(
    num_hashes: int,
    threshold: float,
    false_negative_weight: float = 2.0,
) -> tuple[int, int]:
    """Pick the (bands, rows) factorization of ``num_hashes`` whose
    banded-LSH S-curve best matches a Jaccard ``threshold``.

    A pair with Jaccard j becomes a candidate with probability
    ``1 - (1 - j^r)^b``. Each divisor pair (b, r = H/b) is scored by the
    integrated collision probability BELOW the threshold (false-candidate
    mass, costs verify work) plus ``false_negative_weight`` times the
    integrated miss probability ABOVE it (missed near-dups, costs
    correctness — weighted heavier because dedup misses are silent).
    Returns the minimizing (bands, rows).

    Driver-side arithmetic over ~a dozen divisors — call it once, pass
    the result to :func:`minhash_lsh_pairs` / incremental / streaming."""
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        steps = 200
        fp = fn = 0.0
        for i in range(steps):
            j = (i + 0.5) / steps
            p = 1.0 - (1.0 - j ** r) ** b
            if j < threshold:
                fp += p
            else:
                fn += (1.0 - p)
        cost = fp / steps + false_negative_weight * fn / steps
        if best is None or cost < best[0]:
            best = (cost, b, r)
    return best[1], best[2]
