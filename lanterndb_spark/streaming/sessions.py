"""Gap-based sessionization — the engine's custom stateful streaming
operator (applyInPandasWithState), with an oracle-checkable batch twin.

The reference has no streaming (SURVEY §2.9); this is part of the
training-data-pipeline surface: user activity sessions feed per-session
quality metrics and dedup grouping. Two implementations with one
semantics — a new session starts when the gap to the previous event of
the same user exceeds ``gap``:

- ``sessionize_batch``: lag + running sum of session-break flags over a
  (user_id, ts) window. Pure Spark SQL → DuckDB oracle twin in
  __spark_entry__; one shuffle on user_id. This is the 100 TB path for
  bounded data.
- ``sessionize_stream``: per-user state (current session accumulators)
  via applyInPandasWithState in update mode; emits the running session
  row each time it changes, so on a finite input the LAST emission per
  (user_id, session_start) converges to the batch answer — the same
  batch-as-oracle strategy the reference uses for its index
  (hnsw_correct.sql pattern).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
_STATE_SCHEMA = "start double, end double, n long, s double"


def sessionize_native(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Spark's built-in ``session_window`` aggregation — the most
    idiomatic form (works in batch AND streaming with a watermark; the
    state store handles session merges). Semantics note: session_window
    merges an event into the current session when its gap to the previous
    event is STRICTLY LESS than ``gap``; :func:`sessionize_batch` starts a
    new session when the gap EXCEEDS ``gap`` — the two differ only for
    events exactly ``gap`` apart. window end = last event + gap, so
    session_end here is reported as window.end - gap to match the others.
    """
    from lanterndb_spark.session import ensure_ltz

    gap_s = _gap_seconds(gap)
    events = ensure_ltz(events, ts_col)
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            (F.col("w.end").cast("double") - gap_s).cast("timestamp").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value)."""
    from pyspark.sql import Window

    from lanterndb_spark.session import ensure_ltz

    gap_s = _gap_seconds(gap)
    events = ensure_ltz(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    flagged = events.withColumn(
        "__new",
        F.when(
            F.col(ts_col).cast("double")
            - F.lag(F.col(ts_col).cast("double")).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
        .cast("bigint"),
    ).withColumn("__sid", F.sum("__new").over(w))
    return (
        flagged.groupBy(user_col, "__sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("__sid")
    )


def _gap_seconds(gap: str) -> float:
    qty, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[unit]
    return float(qty) * mult


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization in update mode. Requires the input to be
    a streaming DataFrame with an event-time column ``ts_col``."""
    gap_s = _gap_seconds(gap)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start, end, n, s = state.get
        else:
            start = end = None
            n, s = 0, 0.0
        out: list[tuple] = []
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        for ts, val in zip(rows[ts_col], rows[value_col]):
            t = ts.timestamp()
            if start is None:
                start, end, n, s = t, t, 1, float(val)
            elif t - end > gap_s:
                out.append((user, start, end, n, s))  # closed session
                start, end, n, s = t, t, 1, float(val)
            else:
                end, n, s = max(end, t), n + 1, s + float(val)
        state.update((start, end, n, s))
        out.append((user, start, end, n, s))  # running session (update mode)
        pdf = pd.DataFrame(
            out, columns=["user_id", "__start", "__end", "n_events", "sum_value"]
        )
        # build at µs precision — Arrow's safe cast rejects ns→µs
        pdf["session_start"] = pd.to_datetime(
            (pdf["__start"] * 1e6).round().astype("int64"), unit="us"
        )
        pdf["session_end"] = pd.to_datetime(
            (pdf["__end"] * 1e6).round().astype("int64"), unit="us"
        )
        yield pdf[["user_id", "session_start", "session_end", "n_events", "sum_value"]]

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
