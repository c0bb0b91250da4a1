"""Streaming repeated-span dedup: boilerplate cut at ingest time.

Composes ``operators.spans`` with Structured Streaming the way
``streaming/neardup.py`` wraps MinHash: each micro-batch's window hashes
are checked against the ACCUMULATED gram-count store (earlier corpus
text is never revisited — only its kilobyte-per-gram counts), the
arriving documents' repeated spans are emitted, and the batch's counts
fold into the store.

Semantics — FIRST OCCURRENCE SURVIVES at batch granularity (the CCNet
rule, matching ``operators/paragraphs.py``): an arriving document's
window is flagged iff enough earlier-batch plus current-batch documents
carry its content (``min_docs`` total, counting the arrival itself).
The first batch to carry a boilerplate block alone keeps it; every
later carrier gets it flagged at arrival; carriers landing in the SAME
batch all flag (a micro-batch is an unordered set — there is no
within-batch arrival order to break the tie with). Retroactive flags on
earlier documents are deliberately NOT emitted — the first copy is the
one a curation pipeline keeps. With one-copy-per-batch arrival the
union of streamed spans is exactly the batch operator's output minus
the first carrier's spans (pinned in test_streaming_spans.py); in
general every streamed span is a sub-interval of a batch-operator span
for the same document (a window flagged at arrival is flagged by the
full-corpus run a fortiori).

State is the (h, nd) count table — a plain DataFrame a cluster would
persist as Parquet and compact, not per-key streaming state; no
watermark. Counts are additive across batches because document ids are
unique across the stream (the ingest contract every store here shares);
replayed micro-batches (foreachBatch is at-least-once on retry) are
skipped by batch_id so a redelivery can never double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.spans import merge_islands, span_postings


class SpanDedupIngest:
    """Mutable handle: gram-count store + spans emitted so far."""

    def __init__(
        self,
        id_col: str,
        text_col: str,
        min_len: int = 10,
        min_docs: int = 2,
        store: DataFrame | None = None,
    ):
        self.id_col, self.text_col = id_col, text_col
        self.min_len, self.min_docs = min_len, min_docs
        self.store: DataFrame | None = store  # (h, nd)
        self.spans: DataFrame | None = None
        self.batches = 0
        self._last_batch_id: int | None = None

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            # foreachBatch is at-least-once: a retried micro-batch arrives
            # with the SAME batch_id — without this skip a replay would
            # double-count its documents into the gram store and flag
            # spans below min_docs
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
            post = span_postings(
                batch_df, self.id_col, self.text_col, self.min_len
            ).persist()
            try:
                self._process(post, batch_id)
            finally:
                # a failed batch must not strand the cached postings
                post.unpersist()

        return write_batch

    def _process(self, post: DataFrame, batch_id: int) -> None:
        batch_counts = post.groupBy("h").agg(
            F.count_distinct("id").alias("bd")
        )
        if self.store is None:
            nd = batch_counts.select("h", F.col("bd").alias("nd"))
        else:
            nd = (
                batch_counts.join(self.store, on="h", how="full")
                .select(
                    "h",
                    (
                        F.coalesce(F.col("bd"), F.lit(0))
                        + F.coalesce(F.col("nd"), F.lit(0))
                    ).alias("nd"),
                )
            )
        dup = nd.filter(F.col("nd") >= self.min_docs).select("h")
        hits = post.join(dup, on="h").select(
            "id", "s", (F.col("s") + F.lit(self.min_len)).alias("e")
        )
        # eager localCheckpoint: materializes BEFORE the store mutates
        # (lazy plans must not see counts from batches after their own)
        # AND truncates lineage so N batches never nest N batch plans.
        # BOTH Spark actions run before ANY self-mutation, so a failed
        # batch leaves the handle exactly as it was and the retry
        # replays cleanly.
        found = merge_islands(hits, self.id_col).localCheckpoint(eager=True)
        new_store = nd.localCheckpoint(eager=True)
        self.spans = (
            found if self.spans is None else self.spans.unionByName(found)
        )
        if self.store is not None:
            # the new generation is materialized (eager) — free the
            # replaced store's checkpoint blocks, or a long-running
            # stream accumulates one dead generation per batch
            from lanterndb_spark.plans.shape import CheckpointHandle

            CheckpointHandle(self.store).unpersist()
        self.store = new_store
        self.batches += 1
        # marker moves ONLY after success (see streaming/ann.py)
        self._last_batch_id = int(batch_id)

    def all_spans(self) -> DataFrame:
        if self.spans is None:
            raise ValueError("no batches processed yet")
        return self.spans


def span_dedup_ingest_stream(
    id_col: str = "doc_id", text_col: str = "text", **params
) -> SpanDedupIngest:
    """Wire a document stream into streaming span dedup::

        ingest = span_dedup_ingest_stream("doc_id", "text", min_len=10)
        q = (docs_stream.writeStream.foreachBatch(ingest.writer())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        boilerplate = ingest.all_spans()
    """
    return SpanDedupIngest(id_col, text_col, **params)
