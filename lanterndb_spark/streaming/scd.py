"""Streaming SCD2: maintain a versioned dimension table at ingest time.

The batch operator (``operators/scd.py``) rebuilds the whole history
from the full change log; a CDC stream cannot afford that. This module
folds each micro-batch of changes into an ACCUMULATED history table by
rebuilding ONLY the keys the batch touches:

1. split the stored history on the batch's key set (anti/semi join);
2. re-express the touched keys' versions as change points
   (``valid_from`` is, by construction, the ts of the change that
   opened the version);
3. re-run the batch compression+interval assignment over those change
   points plus the new rows;
4. union the untouched history back in.

Contract (verified in tests): with per-key in-order delivery — the
standard CDC ordering guarantee — the stored history after any prefix
of batches EQUALS ``scd2_history`` over the union of all changes seen.
Out-of-order arrivals are also spliced correctly into the middle of the
timeline (the containing version closes, compression re-merges), with
ONE inherent caveat: a no-op change that an earlier batch compressed
away cannot re-anchor its value after a later splice lands before it
(the compressed state no longer holds that change point). Keep the raw
log if full out-of-order replay matters; the history alone cannot.

Tiebreak note: history-derived change points re-enter the rebuild with
a NULL tiebreak, which sorts before any batch tiebreak at an equal
timestamp — a late batch row with exactly the ts of an existing change
point lands after it deterministically.

Scale: each batch's cost is (history ⋈ key-set) + a windowed rebuild
of the touched keys only. The history never leaves executor space; at
cluster scale persist it bucketed by key (``sources/bucketed.py``) and
both the split joins and the rebuild window run without an Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.scd import scd2_history


class Scd2Ingest:
    """Mutable handle over the accumulated history table."""

    def __init__(
        self,
        key_col: str,
        ts_col: str,
        attr_cols: list[str],
        tiebreak_col: str | None = None,
    ):
        self.key_col, self.ts_col = key_col, ts_col
        self.attr_cols = list(attr_cols)
        self.tiebreak_col = tiebreak_col
        self.history: DataFrame | None = None
        self.batches = 0
        self._last_batch_id: int | None = None

    def _as_changes(self, hist: DataFrame) -> DataFrame:
        """Versions → change points (the ts that opened each version)."""
        cols = [
            F.col(self.key_col),
            F.col("valid_from").alias(self.ts_col),
            *[F.col(c) for c in self.attr_cols],
        ]
        if self.tiebreak_col is not None:
            cols.append(
                F.lit(None).cast("long").alias(self.tiebreak_col)
            )
        return hist.select(*cols)

    def _batch_changes(self, batch_df: DataFrame) -> DataFrame:
        cols = [self.key_col, self.ts_col, *self.attr_cols]
        if self.tiebreak_col is not None:
            cols.append(self.tiebreak_col)
        return batch_df.select(*cols)

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # at-least-once guard: a foreachBatch retry redelivers the
            # same batch_id — re-merging the same changes could mint
            # duplicate versions for keys whose rows replay
            if self._last_batch_id is not None:
                if batch_id < self._last_batch_id:
                    # a batch id going BACKWARDS is not a retry — it means
                    # a fresh query (ids restart at 0) was wired to this
                    # handle, e.g. after a checkpoint wipe; skipping would
                    # silently drop its data, so fail loudly instead.
                    # Contract: one streaming query per handle.
                    raise RuntimeError(
                        f"batch_id regression ({batch_id} after "
                        f"{self._last_batch_id}): this handle is bound to "
                        "one streaming query - create a fresh handle for a "
                        "fresh query"
                    )
                if batch_id == self._last_batch_id:
                    return  # at-least-once retry of the same micro-batch
            changes = self._batch_changes(batch_df)
            if self.tiebreak_col is not None:
                changes = changes.withColumn(
                    self.tiebreak_col, F.col(self.tiebreak_col).cast("long")
                )
            if self.history is None:
                new_hist = scd2_history(
                    changes, self.key_col, self.ts_col, self.attr_cols,
                    tiebreak_col=self.tiebreak_col,
                )
            else:
                keys = changes.select(self.key_col).distinct()
                untouched = self.history.join(keys, self.key_col, "left_anti")
                touched = self.history.join(keys, self.key_col, "left_semi")
                rebuilt = scd2_history(
                    self._as_changes(touched).unionByName(changes),
                    self.key_col, self.ts_col, self.attr_cols,
                    tiebreak_col=self.tiebreak_col,
                )
                new_hist = untouched.unionByName(rebuilt)
            # eager localCheckpoint: materializes before the handle mutates
            # (downstream plans must not lazily recompute against a later
            # history) AND truncates lineage — persist alone would nest
            # every prior batch's plan inside the history forever (the
            # connected_components lesson, operators/dedup.py)
            old_hist = self.history
            self.history = new_hist.localCheckpoint(eager=True)
            if old_hist is not None:
                # the new generation is materialized — free the replaced
                # history's checkpoint blocks (one dead generation per
                # batch otherwise; materialize current() reads before
                # the next batch, per the contract above)
                from lanterndb_spark.plans.shape import CheckpointHandle

                CheckpointHandle(old_hist).unpersist()
            self.batches += 1
            # marker moves ONLY after success (see streaming/ann.py)
            self._last_batch_id = int(batch_id)

        return write_batch

    def current(self) -> DataFrame:
        """The live (open) version per key."""
        if self.history is None:
            raise ValueError("no batches processed yet")
        return self.history.filter(F.col("is_current"))


def scd2_ingest_stream(
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> Scd2Ingest:
    return Scd2Ingest(key_col, ts_col, attr_cols, tiebreak_col=tiebreak_col)
