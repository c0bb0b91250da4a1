"""Structured Streaming operators.

The reference has NO streaming semantics (SURVEY §2.9 notes this
explicitly) — its closest analogues are the insert-time index maintenance
(aminsert, insert.c:51-262) and the NOTIFY-driven job daemon
(daemon/embedding_jobs.rs). This module re-expresses those as Spark
Structured Streaming:

- ``windowed_event_counts``: watermarked tumbling-window aggregation over
  an event stream (the batch twin is __spark_entry__.q_events_tumbling,
  which IS the correctness oracle — streaming results over a finite input
  must converge to the batch answer);
- ``incremental_postings_stream``: the streaming analogue of BM25 insert
  maintenance — per-micro-batch partial postings are appended, and
  ``consolidate_postings`` (operators.bm25) merges them, exactly like the
  reference's consolidate_bm25_table after incremental inserts
  (bm25_api.sql:108-159).

At scale these run with the same code against Kafka/file sources; tests
drive them with the file source over the driver's events parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_FIELDS = (
    "event_id bigint, ts {ts_type}, user_id bigint, event_type string, "
    "value double, props string"
)


def _ts_parquet_type(path: str):
    """Parquet-level ``ts`` type sniff — shared with the batch loader
    (session.ts_parquet_type) so batch and streaming reads of the same
    file agree on int64 interpretation. Guessing wrong is a SILENT 1000x
    timestamp corruption, so read the unit from the file."""
    from lanterndb_spark.session import ts_parquet_type

    return ts_parquet_type(path)


def stream_events(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over an events parquet directory, normalized so
    downstream watermarks/windows always see a proper TIMESTAMP (LTZ)
    ``ts`` regardless of how the file encodes it (nanos-as-long,
    micros-no-tz, or tz-aware)."""
    unit, tz = _ts_parquet_type(path)
    if unit == "ns":
        # no Spark nanos type: read as long under the legacy flag, then
        # integer-div to micros (float division loses precision at ~1e18)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _EVENTS_FIELDS.format(ts_type="bigint")
        fix = lambda df: df.withColumn(  # noqa: E731
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif unit == "int64":
        # a genuine long column: epoch micros by convention
        schema = _EVENTS_FIELDS.format(ts_type="bigint")
        fix = lambda df: df.withColumn("ts", F.timestamp_micros("ts"))  # noqa: E731
    else:
        # s/ms/us timestamp: declare the matching Spark type and upcast
        # NTZ -> LTZ (session tz is UTC, wall clock preserved)
        schema = _EVENTS_FIELDS.format(
            ts_type="timestamp" if tz else "timestamp_ntz")
        fix = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp"))  # noqa: E731

    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if path.endswith(".parquet"):
        # file source requires a directory; glob down to the single file
        base, fname = path.rsplit("/", 1)
        reader = reader.option("pathGlobFilter", fname)
        path = base
    return fix(reader.parquet(path))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts+sums per event_type. Late rows
    beyond the watermark are dropped; output schema matches the batch twin
    q_events_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type", "n", "sum_value",
        )
    )


def embedding_job_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    model: str = "hash/debug-64",
    out_col: str = "embedding",
):
    """Streaming embedding generation — the NOTIFY-driven daemon job
    (lantern_cli/src/daemon/embedding_jobs.rs:271-1279) recast: each
    micro-batch runs the batch embed operator and appends to an
    accumulated result, with failed rows quarantined per batch exactly
    like the failed-rows table (embeddings/mod.rs:69-83).

    Returns (writer_fn, state): pass writer_fn to
    ``docs_stream.writeStream.foreachBatch(...)``; ``state['ok']`` /
    ``state['failed']`` hold the unions so far."""
    from lanterndb_spark.operators.embed import embed, quarantine_failed

    state: dict = {"ok": None, "failed": None, "batches": 0}

    def write_batch(batch_df: DataFrame, batch_id: int):
        ok, failed = quarantine_failed(
            embed(batch_df, text_col, model=model, out_col=out_col), out_col
        )
        # eager localCheckpoint: materialize within the batch (a
        # micro-batch frame must not be lazily re-read after its batch)
        # and truncate lineage so N batches never nest N plans
        ok = ok.localCheckpoint(eager=True)
        failed = failed.localCheckpoint(eager=True)
        state["ok"] = ok if state["ok"] is None else state["ok"].unionByName(ok)
        state["failed"] = (
            failed if state["failed"] is None else state["failed"].unionByName(failed)
        )
        state["batches"] += 1

    return write_batch, state


def incremental_postings_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-micro-batch partial postings via foreachBatch.

    Returns (writer_fn, state) where writer_fn is meant for
    ``docs_stream.writeStream.foreachBatch(writer_fn)``: each batch's
    postings are built with the batch operator and unioned into
    ``state['postings']``; call ``consolidate()`` for the merged view
    (consolidate_bm25_table semantics)."""
    from lanterndb_spark.operators.bm25 import build_postings, consolidate_postings

    state: dict = {"postings": None}

    def write_batch(batch_df: DataFrame, batch_id: int):
        part = build_postings(batch_df, id_col=id_col, text_col=text_col)
        # same materialize-and-truncate contract as embedding_job_stream
        part = part.localCheckpoint(eager=True)
        prev = state["postings"]
        state["postings"] = part if prev is None else prev.unionByName(part)

    def consolidate() -> DataFrame:
        if state["postings"] is None:
            raise ValueError("no batches processed yet")
        return consolidate_postings(state["postings"])

    return write_batch, consolidate, state
