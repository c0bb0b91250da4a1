"""Stream-stream event-time joins — the streaming counterpart of the
batch temporal family (operators/temporal.py).

The reference has no streaming (SURVEY §2.9); this completes the
training-pipeline surface the batch temporal joins opened: correlate two
live event streams (clicks↔purchases, requests↔errors) by key within an
event-time window, with bounded state.

Spark-native shape: Structured Streaming's stream-stream inner join with
a TIME-RANGE condition. Both sides carry watermarks; the range condition
(``right.ts BETWEEN left.ts AND left.ts + window``) lets the state store
EVICT rows older than ``watermark + window`` instead of buffering each
side forever — the difference between bounded state and an OOM at day 2
of a production stream. Semantics match :func:`batch_interval_join`
below, which is the oracle (finite input: stream result == batch
result).

At scale both streams shuffle once on the join key; state per key is the
in-window slice only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    l_ts: str = "ts",
    r_ts: str = "ts",
    l_prefix: str = "l_",
    r_prefix: str = "r_",
) -> DataFrame:
    """Inner-join two event streams on ``key`` where the right event lands
    in ``[left.ts, left.ts + window]``.

    Both inputs must be streaming DataFrames with event-time columns.
    Output columns are prefix-renamed (stream-stream joins forbid
    ambiguous names); the join keeps ``key`` unprefixed.
    """
    lw = left.withWatermark(l_ts, watermark).select(
        F.col(key),
        *[F.col(c).alias(f"{l_prefix}{c}") for c in left.columns if c != key],
    )
    rw = right.withWatermark(r_ts, watermark).select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"{r_prefix}{c}") for c in right.columns if c != key],
    )
    lcol = F.col(f"{l_prefix}{l_ts}")
    rcol = F.col(f"{r_prefix}{r_ts}")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (rcol >= lcol)
        & (rcol <= lcol + F.expr(f"INTERVAL {window}"))
    )
    return lw.join(rw, cond, "inner").drop("__rkey")


def batch_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    window: str = "1 hour",
    l_ts: str = "ts",
    r_ts: str = "ts",
    l_prefix: str = "l_",
    r_prefix: str = "r_",
) -> DataFrame:
    """Batch twin with IDENTICAL semantics — the correctness oracle for
    :func:`stream_interval_join` on finite input, and the plan to reach
    for on bounded data (where operators/temporal.py range_join's
    bucketed shape avoids the state store entirely)."""
    lw = left.select(
        F.col(key),
        *[F.col(c).alias(f"{l_prefix}{c}") for c in left.columns if c != key],
    )
    rw = right.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"{r_prefix}{c}") for c in right.columns if c != key],
    )
    lcol = F.col(f"{l_prefix}{l_ts}")
    rcol = F.col(f"{r_prefix}{r_ts}")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (rcol >= lcol)
        & (rcol <= lcol + F.expr(f"INTERVAL {window}"))
    )
    return lw.join(rw, cond, "inner").drop("__rkey")
