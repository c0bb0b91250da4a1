"""Streaming HNSW index maintenance — the daemon analogue on the
reference's NAMESAKE index.

The reference's external-index daemon keeps a lantern_hnsw graph current
as rows arrive: ``aminsert`` appends each vector to the existing graph
without retraining (lantern_hnsw/src/hnsw/insert.c:51-262), deletes
tombstone labels that scans skip (delete.c:15-72, scan.c:294-300), and
REINDEX/vacuum folds the churn.

Where ``streaming/ann.py`` recasts this lifecycle over the IVF layout
(delta assignment), this module runs it on the GRAPH backend proper:
each micro-batch cogroups into its shard's existing numpy graph via
``hnsw_insert`` — the graphs literally grow in place, no retrain, the
aminsert economics on the same structure the reference uses. Deletes
tombstone driver-side and are skipped at emit time; ``compact()`` is
the vacuum moment (shard-local rebuilds without the dead rows).

Because every batch rewrites only the shards it touches (untouched
shards pass through as their existing blobs), a batch of b rows costs
O(b·insert) + blob (de)serialization of the touched shards — not a
table rebuild. The handle persists each generation's graphs and
unpersists the previous one, so lineage stays one generation deep (the
localCheckpoint discipline every iterative store here follows, done by
persist-swap since graphs are small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lanterndb_spark.operators.hnsw import (
    HnswIndex,
    hnsw_compact,
    hnsw_insert,
    hnsw_search,
    hnsw_search_batch,
)


class HnswIngest:
    """Mutable handle over a base HnswIndex plus streamed inserts/deletes.

    Use ``writer`` with ``stream.writeStream.foreachBatch(...)``; query
    through ``search()`` / ``search_batch()`` at any point; ``compact()``
    folds tombstones out of the graphs."""

    def __init__(self, index: HnswIndex):
        self.index = index
        self.tombstone_ids: set = set()
        self.batches = 0
        self._last_batch_id: int | None = None

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # at-least-once guard: a foreachBatch retry redelivers the
            # same batch_id — replaying would insert the rows twice
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
            # grow the existing shard graphs in place (aminsert,
            # insert.c:51-262); this handle OWNS its generations, so the
            # superseded one unpersists here — lineage stays one
            # generation deep
            old = self.index
            # broadcast_delta: micro-batches are small by contract (the
            # whole handle's economics are O(batch), module docstring),
            # and foreachBatch frames carry no Catalyst rowCount for the
            # auto gate — untouched shard blobs then pass through the
            # JVM verbatim instead of re-shuffling through Python (r15)
            self.index = hnsw_insert(old, batch_df, broadcast_delta=True)
            old.graphs.unpersist()
            self.batches += 1
            # marker moves ONLY after success (see streaming/ann.py)
            self._last_batch_id = int(batch_id)

        return write_batch

    def delete(self, ids: list) -> None:
        """Tombstone ids (ambulkdelete analogue) — skipped at emit from
        the next search on (scan.c:294-300); storage reclaimed at
        compact()."""
        self.tombstone_ids.update(int(i) for i in ids)

    def search(self, base: DataFrame, query, k: int = 10, **kw) -> DataFrame:
        return hnsw_search(
            self.index, base, query, k=k,
            deleted=self.tombstone_ids or None, **kw,
        )

    def search_batch(self, queries: list, k: int = 10, **kw) -> DataFrame:
        return hnsw_search_batch(
            self.index, queries, k=k,
            deleted=self.tombstone_ids or None, **kw,
        )

    def search_df(self, queries: DataFrame, k: int = 10, **kw) -> DataFrame:
        """DataFrame-native batch ANN over the LIVE graphs — streamed
        rows are searchable immediately, tombstones are skipped at emit,
        and the query volume is unbounded (``hnsw_search_df``: queries
        shuffle to shards), so an eval pass can run mid-ingest. The
        graph twin of ``streaming.ann.AnnIngest.search_df``; q_ids of
        any type ride the surrogate-key wrap."""
        from lanterndb_spark.operators.hnsw import hnsw_search_df

        return hnsw_search_df(
            self.index, queries, k=k,
            deleted=self.tombstone_ids or None, **kw,
        )

    def compact(self) -> HnswIndex:
        """Vacuum: shard-local rebuilds drop the tombstoned rows; the
        tombstone set retires."""
        old = self.index
        self.index = hnsw_compact(old, self.tombstone_ids)
        if self.index is not old:
            old.graphs.unpersist()
        self.tombstone_ids = set()
        return self.index


def hnsw_ingest_stream(index: HnswIndex) -> HnswIngest:
    """Wire a vector stream into an existing HNSW index::

        ingest = hnsw_ingest_stream(idx)
        q = (vec_stream.writeStream.foreachBatch(ingest.writer())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        hits = ingest.search_batch(queries, k=10, ef=64)
    """
    return HnswIngest(index)
