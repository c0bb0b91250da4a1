"""Slowly-changing-dimension (type 2) history from a change log.

The reference engine stores one current row per entity; pipelines that
train on temporal data need the other shape — every historical version
with its validity interval — so that features can be joined *as of* the
example's timestamp without leakage (the batch twin of
``operators/temporal.py``'s as-of join).

``scd2_history`` turns an append-only change log ``(key, ts, attrs...)``
into versioned rows ``(key, attrs..., valid_from, valid_to,
is_current)``:

1. **change compression** — a log row that repeats the previous
   attribute values for its key is a no-op and produces no version
   (window lag on the attr struct);
2. **interval assignment** — ``valid_from = ts`` of the effective
   change, ``valid_to = ts`` of the NEXT effective change (window
   lead), NULL for the open current version.

Both windows share one partitioning (key) and one ordering (ts +
tiebreak), so the whole operator is a single shuffle at any scale; the
filter between them preserves distribution and order, so Catalyst plans
exactly one Exchange. Keys are entity ids (users, devices, SKUs) —
high-cardinality and hash-uniform, the well-behaved shuffle case.

``scd2_snapshot`` is the pure-filter point-in-time read:
``valid_from <= at < coalesce(valid_to, +inf)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Versioned SCD2 rows from a change log.

    ``tiebreak_col`` makes same-timestamp changes deterministic (e.g. a
    log sequence number); when two changes share (ts, tiebreak) the
    result is still deterministic per-key because the attr struct is the
    final ordering component.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    order.append(F.struct(*[F.col(c) for c in attr_cols]).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    attrs = F.struct(*[F.col(c) for c in attr_cols])
    compressed = (
        changes.withColumn("__prev_attrs", F.lag(attrs).over(w))
        .filter(
            F.col("__prev_attrs").isNull()
            | ~attrs.eqNullSafe(F.col("__prev_attrs"))
        )
        .drop("__prev_attrs")
    )
    out = (
        compressed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    keep = [key_col, *attr_cols, "valid_from", "valid_to", "is_current"]
    return out.select(*keep)


def scd2_snapshot(history: DataFrame, at: Column | str) -> DataFrame:
    """Point-in-time read of an SCD2 table: the version of each key that
    was valid at ``at`` (a timestamp literal/column). Pure filter — with
    the history partitioned or Z-ordered on ``valid_from`` this prunes
    at the file level."""
    at_c = F.lit(at) if isinstance(at, str) else at
    return history.filter(
        (F.col("valid_from") <= at_c)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_c))
    ).drop("is_current")
