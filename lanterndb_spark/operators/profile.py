"""Table profiling and constraint validation — the data-quality gate a
production ingest runs before anything downstream trusts a batch.

Beyond the reference (which trusts Postgres constraints); in a Parquet
lake nothing enforces uniqueness or referential integrity, so the
pipeline itself must check. Two surfaces:

- :func:`profile_table` — one row per column with null fraction, exact
  distinct count, min/max, mean/std. All columns are profiled in a
  SINGLE aggregate pass: each per-column statistic is an independent
  aggregate expression, so Spark computes them map-side-combined in one
  shuffle-to-one-row job (the multi-`count_distinct` Expand multiplies
  map rows by the distinct-column count — the documented price of exact
  distincts; swap in ``approx=True`` HLL sketches at the scale where it
  bites, same one-pass shape).
- :func:`check_constraints` — declarative rules (unique / not_null /
  foreign_key / range) evaluated as aggregates and anti-joins, one
  result row per rule with its violation count. FK checks are
  left-anti joins that broadcast the parent's key set when small; at
  scale they shuffle on the key like any join — never a driver-side
  set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, dtype, n, n_null, null_frac, n_distinct, min_str, max_str,
    mean, std) — one row per profiled column, computed in one pass.

    ``approx=True`` swaps exact ``count_distinct`` for HLL++
    ``approx_count_distinct`` (no Expand, strictly one combine per
    column) — the 100 TB default; exact is the oracle mode."""
    cols = cols or [f.name for f in df.schema.fields]
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nnull"),
            distinct.alias(f"{c}__ndist"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
        if c in numeric:
            aggs += [
                F.avg(F.col(c).cast("double")).alias(f"{c}__mean"),
                F.stddev_samp(F.col(c).cast("double")).alias(f"{c}__std"),
            ]
    row = df.agg(*aggs)
    dtypes = dict(df.dtypes)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("__n").alias("n"),
            F.col(f"{c}__nnull").alias("n_null"),
            (F.col(f"{c}__nnull") / F.greatest(F.col("__n"), F.lit(1))).alias("null_frac"),
            F.col(f"{c}__ndist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
            (F.col(f"{c}__mean") if c in numeric else F.lit(None).cast("double")).alias("mean"),
            (F.col(f"{c}__std") if c in numeric else F.lit(None).cast("double")).alias("std"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def check_constraints(tables: dict[str, DataFrame], rules: list[dict]) -> DataFrame:
    """One row per rule: (rule, table, violations). Rule dicts:

    - ``{"kind": "unique", "table": t, "cols": [...]}`` — rows beyond the
      first per key (count - distinct count);
    - ``{"kind": "not_null", "table": t, "col": c}``;
    - ``{"kind": "foreign_key", "table": t, "col": c,
      "ref_table": r, "ref_col": rc}`` — child keys with no parent
      (NULL child keys are not violations, per SQL FK semantics);
    - ``{"kind": "range", "table": t, "col": c, "min": lo, "max": hi}`` —
      non-NULL values outside [lo, hi].

    Every rule reduces to a count; the result is a tiny union of 1-row
    aggregates the driver can collect safely."""
    out = []
    for r in rules:
        t = r["table"]
        df = tables[t]
        kind = r["kind"]
        if kind == "unique":
            cols = r["cols"]
            name = f"unique({t}.{','.join(cols)})"
            v = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(F.sum(F.col("__c") - 1).alias("violations"))
            )
        elif kind == "not_null":
            c = r["col"]
            name = f"not_null({t}.{c})"
            v = df.agg(F.sum(F.col(c).isNull().cast("long")).alias("violations"))
        elif kind == "foreign_key":
            c, rt, rc = r["col"], r["ref_table"], r["ref_col"]
            name = f"fk({t}.{c}->{rt}.{rc})"
            parents = tables[rt].select(F.col(rc).alias(c)).distinct()
            v = (
                df.filter(F.col(c).isNotNull())
                .select(c)
                .join(parents, on=c, how="left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
            )
        elif kind == "range":
            c = r["col"]
            name = f"range({t}.{c} in [{r['min']},{r['max']}])"
            bad = F.col(c).isNotNull() & (
                (F.col(c) < F.lit(r["min"])) | (F.col(c) > F.lit(r["max"]))
            )
            v = df.agg(F.sum(bad.cast("long")).alias("violations"))
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        out.append(
            v.select(
                F.lit(name).alias("rule"),
                F.lit(t).alias("table"),
                F.coalesce(F.col("violations"), F.lit(0)).cast("long").alias("violations"),
            )
        )
    res = out[0]
    for v in out[1:]:
        res = res.unionByName(v)
    return res


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    consistency: float = 1.4826,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Robust per-group outlier detection via median absolute deviation:

        robust_z = |x - median(x)| / (consistency * MAD)

    with ``MAD = median(|x - median(x)|)`` and the 1.4826 factor making
    the score comparable to a gaussian z-score. Unlike mean/std, both
    statistics survive the outliers they're hunting — the standard
    robust filter for length/score distributions in a curation pipeline.

    Returns the input plus ``grp_median, grp_mad, robust_z, is_outlier``
    (``robust_z`` NULL and ``is_outlier`` false when MAD = 0 — a
    majority-constant group has no robust scale to score against).

    Scale shape: two groupBy passes on the group key (exact percentiles
    are SortAggregate per group) + two broadcast-or-shuffle joins back.
    With ``group_cols=None`` the medians are a single global aggregate
    (one row) broadcast to the scoring pass. Group medians are
    per-reducer sorts of one group's values — bounded by the largest
    group, not the table. ``broadcast_stats`` assumes the stats tables
    (one row per group) fit in a broadcast — true for categorical
    groupings like language/source; pass False for very-high-cardinality
    keys and the joins shuffle on the group key instead.
    """
    gcols = list(group_cols or [])
    hint = F.broadcast if broadcast_stats else (lambda d: d)
    x = F.col(value_col).cast("double")
    if gcols:
        med = df.groupBy(*gcols).agg(F.percentile(x, 0.5).alias("grp_median"))
        with_med = df.join(hint(med), on=gcols)
    else:
        med = df.agg(F.percentile(x, 0.5).alias("grp_median"))
        with_med = df.crossJoin(F.broadcast(med))
    absdev = F.abs(x - F.col("grp_median"))
    if gcols:
        mad = (
            with_med.groupBy(*gcols)
            .agg(F.percentile(absdev, 0.5).alias("grp_mad"))
        )
        scored = with_med.join(hint(mad), on=gcols)
    else:
        mad = with_med.agg(F.percentile(absdev, 0.5).alias("grp_mad"))
        scored = with_med.crossJoin(F.broadcast(mad))
    z = absdev / F.nullif(F.lit(consistency) * F.col("grp_mad"), F.lit(0.0))
    return scored.select(
        *df.columns,
        F.round("grp_median", 6).alias("grp_median"),
        F.round("grp_mad", 6).alias("grp_mad"),
        F.round(z, 6).alias("robust_z"),
        F.coalesce(z > F.lit(float(k)), F.lit(False)).alias("is_outlier"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram: one row per bucket ``(bucket, lo_edge,
    hi_edge, n)``, EVERY bucket present (zero counts included) so plots
    and round-trip comparisons need no densify step.

    Bounds default to the column min/max (one extra aggregate pass —
    two doubles to the driver, never data). Values land in
    ``floor((x - lo) / width)`` clamped to the edge buckets, so with
    explicit bounds, out-of-range values accumulate at bucket 0 /
    bins-1 rather than disappearing. NULLs are dropped.

    One map-side-combined groupBy on a bins-bounded key — the cheapest
    possible distribution sketch; the zero-fill join is bins rows.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    x = F.col(value_col).cast("double")
    data = df.filter(x.isNotNull())
    if lo is None or hi is None:
        row = data.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).first()
        lo = float(row["lo"]) if lo is None else float(lo)
        hi = float(row["hi"]) if hi is None else float(hi)
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        hi = lo + 1.0  # degenerate range: one bucket holds everything
    width = (hi - lo) / bins
    bucket = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((x - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    counts = data.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    return (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias("hi_edge"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
    )


def grouped_linreg(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group least-squares fit ``y ~ slope·x + intercept``: one row
    per group with ``slope, intercept, r2, n`` (6dp; NULL slope for
    degenerate groups — fewer than 2 points or zero x-variance).

    Everything rides Spark's ``regr_*`` aggregates — one
    map-side-combined groupBy, no window, no collect; the same
    aggregates exist in DuckDB so the oracle refits from scratch.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    aggs = [
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).cast("bigint").alias("n"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def quantile_bin(
    df: DataFrame,
    value_col: str,
    n_bins: int = 4,
    group_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Equal-frequency (equi-depth) binning: adds ``qbin`` in 1..n_bins
    via ``ntile`` over ``(value, tiebreak)`` — quartiles/deciles for
    feature engineering and balanced stratification. Rank-based, so the
    assignment is integer-exact across engines (no interpolated edge
    floats to disagree on); ``tiebreak_col`` makes ties deterministic.

    Scale note: with ``group_cols`` the sort is per-group (one shuffle,
    bounded by the largest group). WITHOUT groups ntile needs a single
    global sort partition — fine up to millions of rows; beyond that,
    bucket by approximate percentile edges instead and accept edge-tie
    ambiguity (the standard trade at 100 TB).
    """
    from pyspark.sql.window import Window

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    order = [F.col(value_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(*group_cols).orderBy(*order)
        if group_cols
        else Window.orderBy(*order)
    )
    return df.withColumn("qbin", F.ntile(int(n_bins)).over(w))


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric
    column — the standard train-vs-serve / batch-vs-batch drift gate
    (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 drifted).

    Buckets are equi-width over bounds from the COMBINED min/max (so
    both samples share edges); per-bucket fractions are smoothed with
    add-½ (Laplace) counts — ``(n_i + 0.5) / (N + 0.5·bins)`` — which
    keeps empty buckets finite and is exactly reproducible by the SQL
    oracle, unlike epsilon clamps. Returns one row per bucket:
    ``bucket, frac_a, frac_b, contrib`` with
    ``contrib = (frac_a - frac_b) * ln(frac_a / frac_b)``; the PSI is
    ``sum(contrib)``.

    Scale shape: two bins-bounded map-side-combined groupBys + a
    bins-row join — nothing else moves.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    xa = F.col(value_col).cast("double")
    da = df_a.filter(xa.isNotNull())
    db = df_b.filter(xa.isNotNull())
    if lo is None or hi is None:
        ra = da.agg(F.min(xa).alias("lo"), F.max(xa).alias("hi")).first()
        rb = db.agg(F.min(xa).alias("lo"), F.max(xa).alias("hi")).first()
        lo = min(float(ra["lo"]), float(rb["lo"])) if lo is None else float(lo)
        hi = max(float(ra["hi"]), float(rb["hi"])) if hi is None else float(hi)
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins

    def counts(d: DataFrame, name: str) -> DataFrame:
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(F.lit(0),
                       F.floor((xa - F.lit(lo)) / F.lit(width)).cast("int")),
        )
        return d.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).cast("double").alias(name)
        )

    spark = df_a.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        grid.join(counts(da, "na"), "bucket", "left")
        .join(counts(db, "nb"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("na", F.lit(0.0)).alias("na"),
            F.coalesce("nb", F.lit(0.0)).alias("nb"),
        )
    )
    tot = joined.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    sm = joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        ((F.col("na") + 0.5) / (F.col("ta") + 0.5 * bins)).alias("fa"),
        ((F.col("nb") + 0.5) / (F.col("tb") + 0.5 * bins)).alias("fb"),
    )
    return sm.select(
        "bucket",
        F.round("fa", 6).alias("frac_a"),
        F.round("fb", 6).alias("frac_b"),
        F.round(
            (F.col("fa") - F.col("fb")) * F.log(F.col("fa") / F.col("fb")), 6
        ).alias("contrib"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 10_000,
    min_count: int = 1,
) -> DataFrame:
    """Zipf's-law diagnostic for a corpus: least-squares fit of
    ``ln(count) ~ slope * ln(rank) + intercept`` over the ``top_v``
    most frequent tokens (count desc, token asc tiebreak — fully
    deterministic). A healthy natural-language corpus fits slope ≈ -1
    with high r²; machine-generated or template text bends the curve —
    a cheap corpus-level quality gate to sit beside per-doc metrics.

    Returns one row: ``slope, intercept, r2, vocab_size, total_tokens``
    (6dp). Scale shape: token counts are one map-side-combined groupBy;
    the top-V selection is a TakeOrdered (no global sort materialized),
    and the regression runs over at most ``top_v`` rows. ``vocab_size``
    / ``total_tokens`` describe the FULL floored vocabulary, not just
    the fitted head.
    """
    from lanterndb_spark.functions.text import tokenize

    toks = docs.select(
        F.explode(tokenize(F.col(text_col), stopwords=None)).alias("token")
    )
    counts = (
        toks.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= int(min_count))
    )
    totals = counts.agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
    )
    head = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(int(top_v))
    from pyspark.sql.window import Window

    ranked = head.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
        ),
    )
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("cnt").cast("double"))
    fit = ranked.agg(
        F.round(F.regr_slope(ly, lx), 6).alias("slope"),
        F.round(F.regr_intercept(ly, lx), 6).alias("intercept"),
        F.round(F.regr_r2(ly, lx), 6).alias("r2"),
    )
    return fit.crossJoin(F.broadcast(totals))
