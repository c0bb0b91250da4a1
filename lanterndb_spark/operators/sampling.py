"""Deterministic sampling & corpus balancing — reproducible splits at scale.

Training pipelines need sampling that is (a) reproducible run-to-run,
(b) stable under repartitioning, and (c) auditable by another engine.
``df.sample()`` is none of these (seed + partition layout dependent), so
everything here derives from a content hash of a key column:

- ``hash_bucket``: md5-prefix bucket — chosen over xxhash64 precisely
  because md5 is universal, so the SAME assignment is computable in
  DuckDB/Postgres/pandas for audit (the driver oracle does exactly
  that). A PROJECTION: no shuffle, no state — at 100 TB the split adds
  zero cost to the scan it rides on.
- ``hash_split``: named train/val/test assignment from cumulative
  fraction ranges over the bucket.
- ``stratified_sample``: per-stratum fraction via per-stratum hash
  threshold — still a projection (thresholds fold into one CASE chain).
- ``cap_per_group``: at most ``quota`` rows per group (C4-style
  per-domain caps). One shuffle on the group key; the rank filter is
  Spark's WindowGroupLimit, so each map task keeps only ``quota`` rows
  per group before the exchange — a hot domain ships quota rows per
  map task, not its whole posting.

The reference has no sampling surface; its closest kin is index-build
row sampling (ORDER BY random() in lantern/src/hnsw/build.c's sampling
query), which is exactly the non-reproducible idiom this module avoids.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKETS = 1_000_000  # hash-range granularity: fractions resolve to 1e-6


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_bucket(col, n_buckets: int = BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key (+salt).

    First 8 hex chars -> 32-bit int -> mod. Uniform for any key type
    (cast through string), identical in any engine with md5().
    """
    h = F.md5(F.concat(_c(col).cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % F.lit(int(n_buckets))
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a named split by cumulative hash-range.

    ``fractions`` maps name -> fraction (must sum to <= 1; remainder, if
    any, falls into the LAST split). Assignment depends only on
    (key, salt), never on partitioning or row order — re-running on a
    reshuffled copy of the data gives byte-identical splits.
    """
    fractions = dict(fractions or {"train": 0.98, "val": 0.01, "test": 0.01})
    b = hash_bucket(key_col, BUCKETS, salt)
    names = list(fractions)
    edges: list[tuple[str, int]] = []
    acc = 0.0
    for name in names:
        acc += fractions[name]
        edges.append((name, int(round(acc * BUCKETS))))
    case = None
    for name, hi in edges:
        cond = b < hi
        case = F.when(cond, F.lit(name)) if case is None else case.when(cond, F.lit(name))
    case = case.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, case)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (strata missing
    from ``fractions`` keep ``default``). Pure filter projection."""
    b = hash_bucket(key_col, BUCKETS, salt)
    thr = None
    for stratum, frac in sorted(fractions.items()):
        cond = _c(strata_col) == stratum
        lim = F.lit(int(round(frac * BUCKETS)))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = thr.otherwise(F.lit(int(round(default * BUCKETS)))) if thr is not None else F.lit(int(round(default * BUCKETS)))
    return df.filter(b < thr)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str] | str,
    order_cols: Sequence[str] | str,
    quota: int,
) -> DataFrame:
    """At most ``quota`` rows per group, deterministically the first by
    ``order_cols``. Compiles to WindowGroupLimit: map-side per-group
    top-``quota`` heaps run BEFORE the shuffle (asserted in
    test_plans.py), so hot groups never funnel whole through a reducer."""
    gc = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    oc = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*gc).orderBy(*[F.col(c).asc() for c in oc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(quota))
        .drop("__rn")
    )


def mix_to_weights(
    df: DataFrame,
    domain_col: str,
    weights: Mapping[str, float],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample so the output's domain mix matches the
    target ``weights`` as closely as hash thresholds allow — the DoReMi /
    Pile-style "mix corpora to given proportions" step, WITHOUT
    upsampling: the limiting domain (largest target share relative to its
    row count) is kept whole and every other domain is thinned to match.

    With counts n_d and (relative, need not sum to 1) weights w_d, the
    achievable total is T = min_d(n_d / w_d); each domain keeps the rows
    whose :func:`hash_bucket` falls below floor(w_d·T·BUCKETS / n_d).
    Domains absent from ``weights`` are dropped. Like every operator in
    this module the selection is a pure projection over a content hash:
    zero shuffle beyond one tiny count aggregate, identical output on any
    engine with md5() (the driver oracle recomputes it in SQL), stable
    under repartitioning.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).count().collect()
        if r[0] in weights
    }
    present = [d for d in weights if d in counts]
    if not present:
        raise ValueError("no weighted domain has any rows")
    total = min(counts[d] / weights[d] for d in present)
    b = hash_bucket(key_col, BUCKETS, salt)
    thr = None
    for d in present:
        # float-op order mirrors the SQL oracle exactly: (w * T * B) / n
        cut = int(math.floor(weights[d] * total * BUCKETS / counts[d]))
        cond = F.col(domain_col) == d
        thr = F.when(cond, F.lit(cut)) if thr is None else thr.when(cond, F.lit(cut))
    return df.filter(b < thr.otherwise(F.lit(0)))


def temperature_weights(
    df: DataFrame, domain_col: str, tau: float = 0.5
) -> dict:
    """Temperature-scaled domain weights ``w_d = n_d ** tau`` — the
    multilingual/multi-corpus sampling rule (e.g. mBERT/XLM-R exponential
    smoothing): ``tau=1`` keeps natural proportions, ``tau=0`` is uniform,
    intermediate values upweight tail domains without drowning the head.
    Feed the result to :func:`mix_to_weights`, which resolves it into
    deterministic hash thresholds (no upsampling; the limiting domain is
    kept whole).

    One tiny count aggregate (#domains rows); the weight math happens
    driver-side in IEEE doubles so a SQL oracle recomputing
    ``pow(n, tau)`` reproduces the thresholds bit-for-bit.
    """
    counts = df.groupBy(domain_col).count().collect()
    return {r[0]: float(r[1]) ** tau for r in counts}


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment that NEVER separates near-duplicates:
    every connected component of the pair graph hashes as one unit (its
    min-id representative), so a document and its near-dup can't land on
    opposite sides of a train/eval boundary — the contamination path
    plain per-row splitting leaves open. Rows in no pair hash by their
    own id, making this a strict generalization of :func:`hash_split`.

    Scale shape: components come from DataFrame label propagation
    (iterations of join + min-agg on the pair list, pair-sized not
    corpus-sized), the component map left-joins back on the id, and the
    split itself is the same md5 range — deterministic under
    reshuffling, engine-reproducible."""
    from lanterndb_spark.operators.dedup import connected_components

    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    out = df.join(comp, on=id_col, how="left")
    keyed = out.withColumn(
        "__skey", F.coalesce(F.col("component"), F.col(id_col))
    )
    return hash_split(keyed, "__skey", fractions, salt, split_col).drop(
        "__skey", "component"
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic subsample to a total-weight budget (the "give me
    ~10B tokens of this corpus" op): rows are ordered by their md5 hash
    (an order-free deterministic shuffle), and the prefix whose running
    weight stays within ``budget`` is kept — so the sample is unbiased
    w.r.t. any corpus ordering, reproducible across engines, and grows
    MONOTONICALLY with the budget (a 2B-token sample is a prefix of the
    10B one, which makes scaling-law ladders consistent).

    One global sort by hash — at cluster scale this is a total-order
    range shuffle, the price of an exact budget cutoff. The cumulative
    window uses the hash order itself, so no single reducer sees more
    than its range of the hash space."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.orderBy(h).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("__cum", F.sum(F.col(weight_col).cast("long")).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k of
    Efraimidis–Spirakis priorities): each row draws a reproducible
    uniform ``u`` from md5(id + salt) and competes with priority
    ``u^(1/w)``; the k largest priorities (per group, or globally) are
    the sample. Inclusion probability is proportional to weight in the
    without-replacement sense, and the draw depends only on
    (id, salt) — re-running on reshuffled data, or in another engine
    with md5(), reproduces the exact sample.

    Rows with NULL or non-positive weight are excluded. Ties (u and w
    both equal) break on id. Output adds ``priority`` (6dp).

    Scale shape: the priority is a pure projection; per-group top-k is
    the WindowGroupLimit pattern (rank shuffles once on the group key),
    and global top-k is a TakeOrdered — no global sort materializes.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    # (int(first 8 hex) + 1) / 2^32: uniform in (0, 1], never 0 so the
    # pow is always defined
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        4294967296.0
    )
    pr = F.pow(u, F.lit(1.0) / w)
    scored = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("priority", pr)
    )
    if group_cols:
        from pyspark.sql.window import Window

        win = Window.partitionBy(*group_cols).orderBy(
            F.col("priority").desc(), F.col(id_col).asc()
        )
        out = (
            scored.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= int(k))
            .drop("__rn")
        )
    else:
        out = scored.orderBy(F.col("priority").desc(), F.col(id_col).asc()).limit(int(k))
    return out.withColumn("priority", F.round("priority", 6))
