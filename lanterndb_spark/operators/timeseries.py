"""Time-series regularization: resample to a fixed grid + gap fill.

Beyond the reference (its temporal surface is operator-level as-of and
range joins, covered in operators/temporal.py); this adds the
hypertable-style `time_bucket → gapfill → locf` pipeline every
time-series store grows, expressed as pure Catalyst:

- bucket: ``F.timestamp_seconds(floor(epoch / step) * step)`` — a plain
  projection, no shuffle;
- per-(key, bucket) aggregate: one shuffle with map-side combine;
- grid densification: per-key min/max bucket → ``F.sequence`` +
  ``explode`` generates the missing buckets executor-side (never a
  driver-side date range), joined back as a left join on the SAME
  (key, bucket) keys;
- fill: LOCF via ``F.last(..., ignorenulls=True)`` over an unbounded
  preceding window per key — one Sort+Window pass that reuses the
  grid's key partitioning.

Scale shape: everything shuffles on (key) or (key, bucket) exactly once
per stage; the generated grid is proportional to the OUTPUT (keys ×
buckets), not the input, and AQE coalesces the sparse post-join
partitions. A key spanning years at 1-minute steps emits ~0.5M rows —
bounded, and per-key independent (no global sequence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_bucket(ts_col: str | Column, step_seconds: int) -> Column:
    """Floor a timestamp column to a fixed step — the time_bucket()
    projection (no shuffle; stays in whole-stage codegen)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    epoch = F.unix_timestamp(c)
    return F.timestamp_seconds((F.floor(epoch / step_seconds) * step_seconds).cast("bigint"))


def resample(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str] | str,
    step_seconds: int,
    aggs: dict[str, Column],
    fill: str | None = "locf",
    grid: str = "per_key",
) -> DataFrame:
    """Aggregate onto a fixed time grid and fill the holes.

    ``aggs``: output-name → aggregate expression over the raw rows (e.g.
    ``{"avg_value": F.avg("value"), "n": F.count("*")}``).
    ``fill``: ``"locf"`` carries the last observed aggregate forward into
    generated gap buckets (counts stay NULL→0 only if you ask — LOCF is
    applied to every agg column; use ``fill=None`` for raw gaps).
    ``grid="per_key"`` densifies each key between ITS OWN min and max
    bucket (no key invents history before its first observation);
    ``grid="global"`` spans every key over the table-wide range.

    Returns one row per (key, bucket) of the densified grid with a
    ``__gap`` flag marking generated rows.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    step = int(step_seconds)
    bucketed = df.withColumn("__bucket", time_bucket(ts_col, step))
    agged = bucketed.groupBy(*keys, "__bucket").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    if grid == "global":
        lo_hi = bucketed.agg(
            F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
        )
        spans = agged.select(*keys).distinct().crossJoin(F.broadcast(lo_hi))
    else:
        spans = agged.groupBy(*keys).agg(
            F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
        )
    # executor-side grid: sequence over the per-key span, one row per step
    full = spans.select(
        *keys,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step} SECONDS"))
        ).alias("__bucket"),
    )
    out = full.join(agged, on=keys + ["__bucket"], how="left")
    gap = F.lit(False)
    for name in aggs:
        gap = gap | F.col(name).isNotNull()
    out = out.withColumn("__gap", ~gap)
    if fill == "locf":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.select(
            *keys,
            "__bucket",
            "__gap",
            *[
                F.last(name, ignorenulls=True).over(w).alias(name)
                for name in aggs
            ],
        )
    elif fill is not None:
        raise ValueError(f"unknown fill mode: {fill!r}")
    return out
