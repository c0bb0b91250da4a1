"""Streaming span dedup: first-occurrence-keep at batch granularity,
convergence to the batch operator's later-copy spans, store seeding."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.spans import repeated_spans
from lanterndb_spark.streaming.spans import span_dedup_ingest_stream

BOILER = "this license text is identical across many corpus documents here"


def _doc(spark, doc_id, text):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_first_occurrence_survives_across_batches(spark):
    ingest = span_dedup_ingest_stream("doc_id", "text", min_len=10, min_docs=2)
    w = ingest.writer()
    w(_doc(spark, 1, f"alpha beta gamma delta {BOILER} one two three"), 0)
    w(_doc(spark, 3, "nothing shared with anybody else at all in this doc"), 1)
    # no repeats seen yet: nothing emitted
    assert ingest.all_spans().count() == 0
    w(_doc(spark, 2, f"{BOILER} completely different tail content here now"), 2)
    w(_doc(spark, 4, f"prefix words then {BOILER} and a suffix"), 3)
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in ingest.all_spans().collect()
    }
    # docs 2 and 4 (later copies) flag; doc 1 (first occurrence) never does
    assert got == {2: (0, 10), 4: (3, 13)}

    # the batch operator on the full corpus flags ALL carriers; the
    # streamed result is exactly its output minus the first carrier's
    corpus = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta {BOILER} one two three"),
            (3, "nothing shared with anybody else at all in this doc"),
            (2, f"{BOILER} completely different tail content here now"),
            (4, f"prefix words then {BOILER} and a suffix"),
        ],
        "doc_id long, text string",
    )
    batch = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in repeated_spans(corpus, "doc_id", "text", 10, 2).collect()
    }
    assert {k: v for k, v in batch.items() if k != 1} == got


def test_same_batch_copies_all_flag(spark):
    ingest = span_dedup_ingest_stream("doc_id", "text", min_len=10, min_docs=2)
    both = spark.createDataFrame(
        [(1, f"{BOILER} tail one"), (2, f"{BOILER} tail two")],
        "doc_id long, text string",
    )
    ingest.writer()(both, 0)
    got = {r["doc_id"] for r in ingest.all_spans().collect()}
    assert got == {1, 2}  # unordered set within a micro-batch


def test_file_stream_spans_contained_in_batch_spans(spark, tmp_path, tables):
    docs = tables["documents"].select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)
    src = str(tmp_path / "span_stream")
    corpus.repartition(3).write.mode("overwrite").parquet(src)

    ingest = span_dedup_ingest_stream("doc_id", "text", min_len=10, min_docs=2)
    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert ingest.batches == 3

    streamed = ingest.all_spans().collect()
    batch = {}
    for r in repeated_spans(corpus, "doc_id", "text", 10, 2).collect():
        batch.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    # every streamed span is a sub-interval of a batch span for its doc
    for r in streamed:
        assert any(
            s <= r["span_start"] and r["span_end"] <= e
            for s, e in batch.get(r["doc_id"], [])
        ), r
    # at least one side of every twin pair surfaces at arrival time
    twin_ids = {r["doc_id"] for r in twins.collect()}
    flagged = {r["doc_id"] for r in streamed}
    for t in twin_ids:
        assert t in flagged or (t - 1_000_000) in flagged


def test_store_generations_released(spark):
    """The postings store swap frees the previous generation's
    checkpoint blocks (the spans themselves accumulate — they are live
    output — but dead store generations must not).

    Tracks the SPECIFIC RDD ids this test's writes create (set diffs),
    not the global persistent count — the ContextCleaner and other
    modules' non-blocking unpersists race the global map under
    full-suite ordering (the r13 flake); our own ids are race-free."""

    def pids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    ingest = span_dedup_ingest_stream("doc_id", "text", min_len=10, min_docs=2)
    w = ingest.writer()
    base = pids()
    w(_doc(spark, 1, f"alpha beta gamma {BOILER} one two"), 0)
    # each batch checkpoints a spans frame (live output, survives) AND a
    # store generation (freed by the NEXT swap) — tell them apart by
    # which ids die on the next write
    prev = pids() - base
    assert prev
    dead_total, store_size = set(), None
    for i in range(1, 4):
        pre = pids()
        w(_doc(spark, 1 + i, f"tail {i} then {BOILER} pad pad pad"), i)
        now = pids()
        dead = prev - now  # the superseded store generation's blocks
        assert dead, f"batch {i} left the previous store generation pinned"
        assert prev & now, f"batch {i-1}'s span checkpoint was wrongly freed"
        if store_size is None:
            store_size = len(dead)
        assert len(dead) == store_size, f"swap {i} freed {sorted(dead)}"
        dead_total |= dead
        prev = now - pre  # this batch's {span ckpt, store gen}
    # spans accumulate: every emitted checkpoint from batches 1..3 still live
    assert not (dead_total & pids())
