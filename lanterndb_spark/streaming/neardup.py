"""Streaming near-duplicate detection: MinHash-LSH at ingest time.

Composes ``operators.dedup.minhash_lsh_incremental`` with Structured
Streaming the same way ``streaming/ann.py`` wraps delta assignment: each
micro-batch of documents is checked against the ACCUMULATED corpus
signature store (batch-vs-store band join, estimate-verified — the
corpus text is never revisited), then its own signatures fold into the
store. The exact streaming analogue of the batch operator: after any
prefix of batches, the emitted pair set equals the full batch run over
the union of those batches restricted to cross/new pairs — each pair is
emitted exactly once, when its LATER doc arrives.

State is the signature table (one row of 64 bigints per doc — the thing
a cluster would persist as Parquet and compact periodically), NOT
per-key streaming state, so no watermark is needed and the store
survives as a plain table between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lanterndb_spark.operators.dedup import minhash_lsh_incremental, minhash_signatures


class NearDupIngest:
    """Mutable handle: signature store + the pairs found so far."""

    def __init__(
        self,
        id_col: str,
        text_col: str,
        num_hashes: int = 64,
        bands: int = 16,
        n: int = 3,
        threshold: float = 0.5,
        max_bucket: int | None = 1_000,
        corpus_sigs: DataFrame | None = None,
    ):
        self.id_col, self.text_col = id_col, text_col
        self.num_hashes, self.bands, self.n = num_hashes, bands, n
        self.threshold, self.max_bucket = threshold, max_bucket
        self.sigs: DataFrame | None = corpus_sigs
        self.pairs: DataFrame | None = None
        self.batches = 0
        self._last_batch_id: int | None = None

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # at-least-once guard: a foreachBatch retry redelivers the
            # same batch_id — replaying would duplicate signatures in the
            # store and re-emit the batch's pairs
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
            # eager localCheckpoint, not persist: a cached plan still embeds
            # its full lineage, so after N batches the store would nest N
            # batch plans (the connected_components lesson, dedup.py)
            new_sigs = minhash_signatures(
                batch_df, self.id_col, self.text_col, self.num_hashes, self.n
            ).localCheckpoint(eager=True)
            if self.sigs is None:
                # first batch: only new-vs-new pairs exist; run the
                # incremental op against an empty store of the same schema
                empty = new_sigs.limit(0)
                found = minhash_lsh_incremental(
                    empty, batch_df, self.id_col, self.text_col,
                    self.num_hashes, self.bands, self.n, self.threshold,
                    self.max_bucket,
                )
            else:
                found = minhash_lsh_incremental(
                    self.sigs, batch_df, self.id_col, self.text_col,
                    self.num_hashes, self.bands, self.n, self.threshold,
                    self.max_bucket,
                )
            # materialize before the store mutates (lazy plans must not
            # see signatures of docs that arrived after their batch) AND
            # truncate lineage (see new_sigs note)
            found = found.localCheckpoint(eager=True)
            self.pairs = found if self.pairs is None else self.pairs.unionByName(found)
            self.sigs = new_sigs if self.sigs is None else self.sigs.unionByName(new_sigs)
            self.batches += 1
            # marker moves ONLY after success (see streaming/ann.py)
            self._last_batch_id = int(batch_id)

        return write_batch

    def all_pairs(self) -> DataFrame:
        if self.pairs is None:
            raise ValueError("no batches processed yet")
        return self.pairs


def near_dup_ingest_stream(
    id_col: str = "doc_id", text_col: str = "text", **params
) -> NearDupIngest:
    """Wire a document stream into streaming near-dup detection::

        ingest = near_dup_ingest_stream("doc_id", "text", threshold=0.5)
        q = (docs_stream.writeStream.foreachBatch(ingest.writer())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        dups = ingest.all_pairs()
    """
    return NearDupIngest(id_col, text_col, **params)
