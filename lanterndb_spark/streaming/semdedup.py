"""Streaming SEMANTIC near-dup detection: the cos graph as arrival gate.

The embedding twin of ``streaming/neardup.py``: each micro-batch of
(id, embedding) rows is checked against the ACCUMULATED corpus — the
batch ships through ``hnsw_search_df`` as a DataFrame query batch over
the cos-metric HNSW the handle maintains, every emitted pair carries
its EXACT rescored cos distance (precision is exact, like the batch
operator ``embedding_near_dup_pairs(method='ann')``) — then its own
rows fold into the graph via ``hnsw_insert`` (aminsert economics,
untouched shards pass through as verbatim bytes). Within-batch pairs
run the brute threshold self-join: micro-batches are small by
construction, so n² of a batch is nothing while staying
recall-lossless where it is cheapest to be.

Emission contract (same as NearDupIngest): a pair is emitted exactly
once, when its LATER doc arrives. Recall matches the batch ann
operator's: a new doc links to its ``k_neighbors`` nearest EARLIER
near-dups, so dup groups wider than ``k_neighbors`` may fragment —
size ``k_neighbors`` at the expected max group size.

State is the graph itself (bounded shard blobs — the thing a cluster
persists via save_hnsw and serves from), not per-key streaming state,
so no watermark is needed.

Reference parity: the reference has no streaming ingest path (its
daemon embeds, it does not dedup) — this is a beyond-reference
pipeline operator composing its aminsert (insert.c:51-262) with its
scan (scan.c:167-238), batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.hnsw import (
    HnswIndex,
    build_hnsw,
    hnsw_insert,
    hnsw_search_df,
)


class SemanticDedupIngest:
    """Mutable handle: the accumulated cos graph + the pairs found so far."""

    def __init__(
        self,
        id_col: str,
        vec_col: str,
        max_cos_dist: float = 0.05,
        k_neighbors: int = 10,
        ef: int = 64,
        nprobe: int | None = None,
        index_params: dict | None = None,
        index: HnswIndex | None = None,
    ):
        self.id_col, self.vec_col = id_col, vec_col
        self.max_cos_dist = float(max_cos_dist)
        self.k_neighbors, self.ef, self.nprobe = int(k_neighbors), int(ef), nprobe
        self.index_params = {"m": 16, "ef_construction": 64, "seed": 42}
        self.index_params.update(index_params or {})
        self.index = index  # None = empty corpus; built on the first batch
        self.pairs: DataFrame | None = None
        self.batches = 0
        self._last_batch_id: int | None = None

    def _within_batch_pairs(self, batch: DataFrame) -> DataFrame:
        """Brute threshold self-join of ONE micro-batch (small by
        construction; exact recall where it is cheapest)."""
        from lanterndb_spark.functions.distance import cos_dist

        a = batch.select(
            F.col(self.id_col).alias("__ia"), F.col(self.vec_col).alias("__va")
        )
        b = batch.select(
            F.col(self.id_col).alias("__ib"), F.col(self.vec_col).alias("__vb")
        )
        return (
            # broadcast the right side explicitly (§3.1): a foreachBatch
            # frame carries no Catalyst stats, so the planner otherwise
            # falls back to CartesianProduct — measured 1,024 near-empty
            # tasks (32x32 partition product) and ~12 s PER MICRO-BATCH
            # of a 64-row stream at bench scale (r15). Micro-batches are
            # small by this handle's own contract (the n^2 comparison is
            # the design), so one side always fits a broadcast.
            a.join(F.broadcast(b), F.col("__ia") < F.col("__ib"))
            .withColumn("cos_dist", cos_dist(F.col("__va"), F.col("__vb")))
            .filter(F.col("cos_dist") <= self.max_cos_dist)
            .select(
                F.col("__ia").alias("id_a"),
                F.col("__ib").alias("id_b"),
                "cos_dist",
            )
        )

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # at-least-once guard (same contract as the sibling handles):
            # a retry redelivers the same batch_id — replaying would
            # re-insert the rows and re-emit the batch's pairs
            if self._last_batch_id is not None:
                if batch_id < self._last_batch_id:
                    raise RuntimeError(
                        f"batch_id regression ({batch_id} after "
                        f"{self._last_batch_id}): this handle is bound to "
                        "one streaming query - create a fresh handle for a "
                        "fresh query"
                    )
                if batch_id == self._last_batch_id:
                    return  # at-least-once retry of the same micro-batch
            batch = batch_df.select(self.id_col, self.vec_col)
            parts = [self._within_batch_pairs(batch)]
            if self.index is not None:
                # cross pairs: the batch queries the accumulated graph
                # BEFORE folding in, so a pair surfaces exactly once —
                # when its later doc arrives
                qdf = batch.select(
                    F.col(self.id_col).alias("q_id"),
                    F.col(self.vec_col).alias("query"),
                )
                cross = (
                    hnsw_search_df(
                        self.index, qdf, k=self.k_neighbors, ef=self.ef,
                        nprobe=self.nprobe,
                        # doc ids ARE the dedup key — duplicates are a
                        # caller error upstream of this operator
                        unique_q_ids=True,
                        # micro-batches are small by this handle's own
                        # contract (the n² self-join above is the
                        # design), but a foreachBatch frame carries no
                        # Catalyst stats — assert the driver route
                        # (r15), like the broadcast_delta insert hint
                        broadcast_queries=True,
                    )
                    .filter(F.col("dist") <= self.max_cos_dist)
                    .select(
                        F.least("q_id", self.id_col).alias("id_a"),
                        F.greatest("q_id", self.id_col).alias("id_b"),
                        F.col("dist").alias("cos_dist"),
                    )
                )
                parts.append(cross)
            found = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
            # materialize BEFORE the graph mutates (a lazy plan must not
            # see rows that arrived after this batch) and truncate
            # lineage (the connected_components lesson)
            found = found.localCheckpoint(eager=True)
            if self.index is None:
                self.index = build_hnsw(
                    batch, self.vec_col, id_col=self.id_col, metric="cos",
                    **self.index_params,
                )
            else:
                old = self.index
                # broadcast_delta: a micro-batch is small by construction
                # (this handle brute self-joins it above), so the insert
                # takes the broadcast shape — untouched shard blobs stay
                # verbatim in the JVM instead of re-shuffling through
                # Python every batch (r15; foreachBatch frames have no
                # Catalyst rowCount, so the auto gate can't see it)
                self.index = hnsw_insert(old, batch, broadcast_delta=True)
                old.graphs.unpersist()
            self.pairs = (
                found if self.pairs is None else self.pairs.unionByName(found)
            )
            self.batches += 1
            # marker moves ONLY after success (see streaming/ann.py)
            self._last_batch_id = int(batch_id)

        return write_batch

    def all_pairs(self) -> DataFrame:
        if self.pairs is None:
            raise ValueError("no batches processed yet")
        return self.pairs


def semantic_dedup_ingest_stream(
    id_col: str = "vec_id", vec_col: str = "embedding", **params
) -> SemanticDedupIngest:
    """Wire an embedding stream into streaming semantic dedup::

        ingest = semantic_dedup_ingest_stream("vec_id", "embedding",
                                              max_cos_dist=0.05)
        q = (emb_stream.writeStream.foreachBatch(ingest.writer())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        dups = ingest.all_pairs()
    """
    return SemanticDedupIngest(id_col, vec_col, **params)
