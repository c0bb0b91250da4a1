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
