"""Temporal joins — as-of (point-in-time) join and range (interval)
join, the two join shapes a training-data / feature pipeline needs that
plain equi-joins can't express.

These are beyond-reference pipeline operators (the reference's relational
spine is Postgres, where users write LATERAL / inequality joins and the
row-store nested-loops them). A naive Spark translation of either is a
BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, the canonical 100 TB
cliff. Both operators here reshape the problem into one hash shuffle:

- ``asof_join``: union the two sides, one window sort per ``by`` group,
  ``last(payload) IGNORE NULLS`` carries the most recent right row onto
  each left row. One shuffle on the by-keys, zero join explosion,
  map-side state is a single row — the same sort-merge shape Flink's
  temporal join and pandas ``merge_asof`` use, but distributed.
- ``range_join``: bucket time into fixed-width bins, explode each
  interval onto the bins it covers, equi-join points to bins, then apply
  the exact range predicate. Catalyst executes a SortMergeJoin/
  ShuffledHashJoin on (bucket, by) instead of a nested loop; each
  (point, interval) pair meets in exactly one bucket so no dedup pass is
  needed.

Determinism: when several right rows share the maximal timestamp for a
left row, the largest payload tuple (struct comparison) wins — callers
needing a specific winner should pre-aggregate the right side to unique
``(by, on)`` keys, which is also what makes a SQL oracle well-defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column, dtype: str = "") -> Column:
    # timestamp (LTZ) → epoch seconds (micro precision); numerics pass
    # through. TIMESTAMP_NTZ has no double cast — callers normalize NTZ
    # inputs to LTZ first via session.ensure_ltz.
    return col.cast("double")


def _norm(df: DataFrame, cols: list[str]) -> DataFrame:
    from lanterndb_spark.session import ensure_ltz

    return ensure_ltz(df, *cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for each left row, attach the single right row
    whose ``on`` value is the closest at-or-before it (``backward``),
    at-or-after it (``forward``), or closest either way (``nearest``),
    matching within equal ``by`` keys. Unmatched left rows keep NULLs
    (left-join semantics, like pandas ``merge_asof`` / DuckDB ASOF LEFT).

    ``tolerance`` (seconds for timestamp ``on``, same units for numeric)
    drops matches farther than the bound, NULLing the right columns.

    Right columns arrive under their own names, ``suffix``-renamed on
    collision with a left column; the matched right ``on`` value is always
    included as ``{on}{suffix}``.

    Scale: one shuffle of |L|+|R| rows on ``by``; the window carries one
    struct of right-payload state per row. With ``by=None`` the window is
    global (single-reducer sort) — always pass by-keys at scale, the same
    constraint pandas/Flink impose.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    by = [by] if isinstance(by, str) else (by or [])
    for c in (on, *by):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    left = _norm(left, [on])
    right = _norm(right, [on])

    payload_cols = [c for c in right.columns if c not in by]  # includes `on`
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    payload = F.struct(*[F.col(c) for c in payload_cols])
    p_type = right.select(payload.alias("p")).schema["p"].dataType

    # Tag order within equal `on`: right(0) before left(1) puts equal-`on`
    # right rows inside the left row's backward frame (inclusive match).
    lhs = left.select(*left.columns, F.lit(1).alias("__tag"),
                      F.lit(None).cast(p_type).alias("__payload"))
    rhs = right.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c)
                         for c in left.columns if c not in (on, *by)],
                       *[F.col(c) for c in (on, *by)],
                       F.lit(0).alias("__tag"),
                       payload.alias("__payload"))
    unioned = lhs.unionByName(rhs)

    # One sort serves both directions: backward = running last non-null
    # payload; forward = first non-null strictly after the current row
    # (equal-`on` rights sort before the left row, so they are exclusive
    # to the forward frame — backward/nearest still match them exactly).
    # The payload tiebreak keeps duplicate-timestamp winners deterministic;
    # map-typed payloads aren't orderable, so it's dropped for those.
    order = [F.col(on).asc(), F.col("__tag").asc()]
    from pyspark.sql.types import MapType

    if not any(isinstance(f.dataType, MapType) for f in p_type.fields):
        order.append(F.col("__payload").asc())
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    back = F.last("__payload", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = F.first("__payload", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing))

    if direction == "backward":
        matched = back
    elif direction == "forward":
        # inclusive equality: an equal-`on` right row (in the backward
        # frame) has diff 0 and must win over any strictly-later row
        matched = F.when(
            _as_double(back[on], "") == _as_double(F.col(on), ""), back
        ).otherwise(fwd)
    else:  # nearest — smaller |diff| wins, backward wins ties
        d_back = _as_double(F.col(on), "") - _as_double(back[on], "")
        d_fwd = _as_double(fwd[on], "") - _as_double(F.col(on), "")
        matched = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_back <= d_fwd, back)
            .otherwise(fwd)
        )

    out = unioned.withColumn("__m", matched).filter(F.col("__tag") == 1)
    if tolerance is not None:
        gap = F.abs(_as_double(F.col(on), "") - _as_double(F.col("__m")[on], ""))
        out = out.withColumn("__m", F.when(gap <= F.lit(float(tolerance)),
                                           F.col("__m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m")[c].alias(out_names[c]) for c in payload_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | str | None = None,
    bucket: float | None = None,
    suffix: str = "_iv",
) -> DataFrame:
    """Inner join of point rows to every interval row with
    ``lo <= point <= hi`` (and equal ``by`` keys, if given) — without the
    BroadcastNestedLoopJoin a raw inequality join compiles to.

    ``bucket`` is the bin width in seconds (timestamps) / value units
    (numerics); default is the max interval length, read with one tiny agg
    job, which caps the per-interval explosion at 2 bins. Narrower buckets
    trade more interval copies for fewer false candidates per bin — tune
    toward the median interval length when lengths are skewed.

    Scale: |points| + Σ⌈len/bucket⌉ rows shuffle on (bucket, by) into a
    hash join; the exact BETWEEN predicate runs post-join. A point falls
    in exactly one bin so no duplicate pairs are produced.
    """
    by = [by] if isinstance(by, str) else (by or [])
    points = _norm(points, [point_col])
    intervals = _norm(intervals, [lo_col, hi_col])
    p = _as_double(F.col(point_col), "")
    lo = _as_double(F.col(lo_col), "")
    hi = _as_double(F.col(hi_col), "")

    if bucket is None:
        row = intervals.select(
            F.max(hi - lo).alias("m")).first()
        bucket = float(row["m"]) if row["m"] else 1.0
        bucket = bucket or 1.0
    if bucket <= 0:
        raise ValueError(f"bucket must be positive: {bucket}")

    iv_names = {c: (c + suffix if c in points.columns else c)
                for c in intervals.columns if c not in by}
    iv = intervals.select(
        *[F.col(c) for c in by],
        *[F.col(c).alias(iv_names[c]) for c in iv_names],
        F.explode(
            F.sequence(F.floor(lo / bucket), F.floor(hi / bucket))
        ).alias("__bin"),
    )
    pt = points.withColumn("__bin", F.floor(p / bucket))

    lo_o = _as_double(F.col(iv_names[lo_col]), "")
    hi_o = _as_double(F.col(iv_names[hi_col]), "")
    cond = [pt["__bin"] == iv["__bin"],
            *[pt[c] == iv[c] for c in by],
            p.between(lo_o, hi_o)]
    joined = pt.join(iv, cond, "inner")
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[iv_names[c]] for c in iv_names],
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    by: list[str] | str | None = None,
    bucket: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join of interval rows to interval rows that overlap them:
    ``max(lo_l, lo_r) <= min(hi_l, hi_r)`` (closed ends), plus equal
    ``by`` keys — completing the temporal family (point-in-time →
    ``asof_join``, point-in-interval → ``range_join``, interval-overlap →
    here) with the same bucketed equi-join shape instead of a nested loop.

    Both sides explode onto fixed-width bins; a candidate pair meets in
    every bin both cover, so the exact predicate is paired with a
    meet-once guard — the pair is kept only in the FIRST overlapping bin,
    ``floor(max(lo_l, lo_r)/bucket)`` — which makes results exactly-once
    without a distinct shuffle. Default bucket = max interval length over
    both sides (≤2 bins per row).
    """
    by = [by] if isinstance(by, str) else (by or [])
    l_lo, l_hi = left_bounds
    r_lo, r_hi = right_bounds
    left = _norm(left, [l_lo, l_hi])
    right = _norm(right, [r_lo, r_hi])

    if bucket is None:
        m_l = left.select(F.max(_as_double(F.col(l_hi), "") -
                                _as_double(F.col(l_lo), "")).alias("m")).first()["m"]
        m_r = right.select(F.max(_as_double(F.col(r_hi), "") -
                                 _as_double(F.col(r_lo), "")).alias("m")).first()["m"]
        bucket = float(max(m_l or 0.0, m_r or 0.0)) or 1.0
    if bucket <= 0:
        raise ValueError(f"bucket must be positive: {bucket}")

    r_names = {c: (c + suffix if c in left.columns else c)
               for c in right.columns if c not in by}

    def binned(df, lo, hi, rename):
        lo_c = _as_double(F.col(lo), "")
        hi_c = _as_double(F.col(hi), "")
        cols = ([F.col(c) for c in by] +
                [F.col(c).alias(rename.get(c, c)) for c in df.columns if c not in by])
        return df.select(
            *cols,
            F.explode(F.sequence(F.floor(lo_c / bucket),
                                 F.floor(hi_c / bucket))).alias("__bin"),
        )

    lhs = binned(left, l_lo, l_hi, {})
    rhs = binned(right, r_lo, r_hi, r_names)

    llo = _as_double(lhs[l_lo], "")
    lhi = _as_double(lhs[l_hi], "")
    rlo = _as_double(rhs[r_names[r_lo]], "")
    rhi = _as_double(rhs[r_names[r_hi]], "")
    start = F.greatest(llo, rlo)
    cond = [lhs["__bin"] == rhs["__bin"],
            *[lhs[c] == rhs[c] for c in by],
            start <= F.least(lhi, rhi),
            F.floor(start / bucket) == lhs["__bin"]]  # meet-once guard
    joined = lhs.join(rhs, cond, "inner")
    return joined.select(
        *[lhs[c] for c in left.columns],
        *[rhs[r_names[c]] for c in r_names],
    )
