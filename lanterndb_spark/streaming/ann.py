"""Streaming ANN index maintenance — continuous vector ingest.

Reference analogue: the external-index daemon keeps a lantern_hnsw index
current as rows arrive — ``aminsert`` appends each new vector to the
existing graph without retraining (lantern_hnsw/src/hnsw/insert.c:51-262),
deletes tombstone labels that scans then skip
(delete.c:15-72, scan.c:294-300), and a REINDEX folds the churn.

Spark recast over the same lifecycle, with Structured Streaming driving
the ingest: each micro-batch of new vectors is assigned to the EXISTING
IVF centroids (``ivf_assign`` — the no-retrain aminsert analogue) inside
``foreachBatch`` and appended to a delta set; deletes tombstone ids
driver-side; ``searchable()`` composes base ∪ deltas MINUS tombstones
with every side carrying ``cluster_id``, so nprobe partition pruning
keeps working across ingested rows; ``compact()`` is the REINDEX moment.

Scale shape: assignment is embarrassingly parallel (broadcast centroids,
Arrow-batched argmin), each micro-batch touches only its own rows, and
the composed searchable view is a union of cluster-pruned scans — no
full-index rewrite on ingest, exactly the aminsert economics. Centroid
DRIFT is the one thing streaming cannot fix incrementally (neither can
the reference — it never retrains on insert either); monitor with
``autotune.validate_ann`` and rebuild when recall degrades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lanterndb_spark.operators.ivf import IvfIndex, ivf_assign
from lanterndb_spark.operators.maintenance import apply_tombstones, with_deltas


class AnnIngest:
    """Mutable handle over a base IvfIndex plus streamed deltas/deletes.

    Use ``writer`` with ``stream.writeStream.foreachBatch(...)``; query
    through ``searchable()`` / ``as_index()`` at any point; ``compact()``
    folds everything into a fresh IvfIndex handle."""

    def __init__(self, index: IvfIndex, id_col: str):
        self.index = index
        self.id_col = id_col
        self.deltas: list[DataFrame] = []
        self.tombstone_ids: list = []
        self.batches = 0
        self._last_batch_id: int | None = None

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # at-least-once guard: a foreachBatch retry redelivers the
            # same batch_id — replaying would append the delta twice
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
            # assign against the frozen centroids — no retrain, like
            # aminsert appending to the existing graph
            self.deltas.append(ivf_assign(self.index, batch_df))
            self.batches += 1
            # marker moves ONLY after success: a failed batch must stay
            # replayable (recording it up front would turn at-least-once
            # into silent at-most-once on retry)
            self._last_batch_id = int(batch_id)

        return write_batch

    def delete(self, ids: list) -> None:
        """Tombstone ids (ambulkdelete analogue) — they disappear from
        ``searchable()`` immediately; storage is reclaimed at compact()."""
        self.tombstone_ids.extend(ids)

    def searchable(self) -> DataFrame:
        """base ∪ streamed deltas MINUS tombstones, all cluster-assigned —
        the scan-time view that skips INVALID_ELEMENT_LABEL rows."""
        out = with_deltas(self.index.assigned, *self.deltas)
        if self.tombstone_ids:
            out = apply_tombstones(out, self.tombstone_ids, self.id_col)
        return out

    def as_index(self) -> IvfIndex:
        """An IvfIndex handle over the composed view — feed straight into
        ivf_search / ivf_search_batch (nprobe pruning included)."""
        return IvfIndex(self.searchable(), self.index.centroids, self.index.vec_col)

    def search_df(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        metric: str = "l2sq",
        id_col: str | None = None,
        **search_params,
    ) -> DataFrame:
        """DataFrame-native batch ANN over the LIVE view (base ∪ deltas
        MINUS tombstones) — an eval pass can run mid-ingest, unbounded
        query volume, without compacting first. Same contract as
        ``operators.ivf.ivf_search_df`` (queries route executor-side to
        their nprobe centroids); the cluster ``isin`` prune covers the
        streamed deltas too, since ``ivf_assign`` stamps every delta
        row's cluster_id against the frozen centroids."""
        from lanterndb_spark.operators.ivf import ivf_search_df

        return ivf_search_df(
            self.as_index(), queries, k=k, nprobe=nprobe, metric=metric,
            id_col=id_col or self.id_col, **search_params,
        )

    def compact(self) -> IvfIndex:
        """REINDEX-lite: fold deltas + tombstones into one clean assigned
        DataFrame under the SAME centroids (persist/write it to retire the
        tombstone set). Retraining on drift is build_ivf, not this."""
        folded = IvfIndex(self.searchable(), self.index.centroids, self.index.vec_col)
        self.index = folded
        self.deltas = []
        self.tombstone_ids = []
        return folded


def ann_ingest_stream(index: IvfIndex, id_col: str = "vec_id") -> AnnIngest:
    """Wire a vector stream into an existing IVF index::

        ingest = ann_ingest_stream(idx, id_col="vec_id")
        q = (vec_stream.writeStream.foreachBatch(ingest.writer())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        hits = ivf_search_batch(ingest.as_index(), queries, k=10, nprobe=4)
    """
    return AnnIngest(index, id_col)
