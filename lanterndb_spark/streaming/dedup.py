"""Streaming deduplication — the ingest-time twin of ``operators.dedup``.

A 100 TB training-data pipeline dedups at ingest, not only in batch
sweeps: every arriving document is checked against what's already been
seen and either dropped or routed to a quarantine sink. The reference has
no streaming surface (SURVEY §2.9); this extends the same content-hash
semantics as ``operators.dedup.exact_dedup`` to Structured Streaming:

- ``dedup_stream``: drop later copies. With a watermark it uses
  ``dropDuplicatesWithinWatermark`` so the dedup state is bounded by the
  watermark horizon — the only shape that survives an unbounded stream.
  Without one it falls back to global ``dropDuplicates`` (state grows
  with the number of DISTINCT keys; fine for bounded key spaces, say a
  crawl frontier, and exactly what batch dedup does).
- ``first_seen_stream``: a custom stateful operator
  (``applyInPandasWithState`` keyed by content hash, one boolean of state
  per distinct key) that KEEPS every row and tags it ``is_duplicate``,
  for pipelines that quarantine dupes instead of dropping them. Within a
  micro-batch the smallest id wins (deterministic); across batches the
  earlier arrival wins (streaming reality — a finite single-batch input
  reproduces batch ``exact_dedup(keep="min")`` exactly, which is what the
  tests assert).

State sizing: both operators shuffle once on the hash; per-key state is
O(1) (a bool / nothing beyond the engine's key entry), so memory is
bounded by distinct keys in the horizon, not by row count.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def content_key(text_col: str = "text") -> Column:
    """64-bit content key: xxhash64 of whitespace-collapsed, lowercased
    text. Use the SAME expression for the batch sweep and the stream so
    their dedup decisions agree."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return F.xxhash64(norm)


def dedup_stream(
    docs: DataFrame,
    on: list[str] | str,
    time_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup on ``on`` (e.g. a content-hash column).

    Pass ``time_col`` + ``watermark`` (e.g. ``("ingest_ts", "1 hour")``)
    to bound state at scale; duplicates farther apart than the watermark
    horizon are then NOT collapsed (they can't be, with bounded memory —
    schedule a periodic batch ``exact_dedup`` sweep for those).
    """
    on = [on] if isinstance(on, str) else on
    if watermark is not None:
        if time_col is None:
            raise ValueError("watermark requires time_col")
        return docs.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(on)
    return docs.dropDuplicates(on)


def first_seen_stream(
    docs: DataFrame,
    key_col: str,
    id_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Tag every row with ``is_duplicate`` instead of dropping copies.

    Output: (key, id, is_duplicate). State per distinct key is a single
    marker; ``timeout="ProcessingTimeTimeout"`` callers can evict idle
    keys by also configuring a state timeout in ``update`` — kept
    NoTimeout by default to mirror batch semantics on finite inputs.
    """
    out_schema = f"{key_col} long, {id_col} long, is_duplicate boolean"
    state_schema = "seen boolean"

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = state.exists
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(id_col)
            flags = [True] * len(pdf)
            if not seen:
                flags[0] = False  # smallest id in the first batch wins
                seen = True
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    "is_duplicate": flags,
                }
            )
        if seen and not state.exists:
            state.update((True,))

    return (
        docs.select(key_col, id_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
