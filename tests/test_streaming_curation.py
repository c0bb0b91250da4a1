"""Curation ops under Structured Streaming: the scrub/quality/packing
signal projections are stateless column expressions, so they must run
unchanged on a stream and agree row-for-row with the batch result."""

from pyspark.sql import functions as F

from lanterndb_spark.functions.pii import scrub
from lanterndb_spark.functions.text import quality_score, repetition_signals

DOCS_PATH = "/root/testdata/sf0.001/documents.parquet"
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _stream_docs(spark):
    base, fname = DOCS_PATH.rsplit("/", 1)
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", fname)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )


def _run(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_pii_scrub_streams_and_matches_batch(spark, tables):
    _run(scrub(_stream_docs(spark)).select("doc_id", "has_pii", "text_clean"),
         "pii_stream")
    got = {
        r["doc_id"]: (r["has_pii"], r["text_clean"])
        for r in spark.sql("SELECT * FROM pii_stream").collect()
    }
    want = {
        r["doc_id"]: (r["has_pii"], r["text_clean"])
        for r in scrub(tables["documents"]).select("doc_id", "has_pii", "text_clean").collect()
    }
    assert got == want


def test_quality_signals_stream_and_match_batch(spark, tables):
    cols = lambda df: df.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("q"),
        *repetition_signals(F.col("text")),
    )
    _run(cols(_stream_docs(spark)), "quality_stream")
    key = lambda r: (r["doc_id"], r["q"], round(r["dup_word_frac"], 6),
                     round(r["dup_bigram_frac"], 6), round(r["top_bigram_frac"], 6))
    got = sorted(key(r) for r in spark.sql("SELECT * FROM quality_stream").collect())
    want = sorted(key(r) for r in cols(tables["documents"]).collect())
    assert got == want


def test_quality_logreg_score_streams_and_matches_batch(spark, tables):
    """The classifier's APPLY path is one literal sigmoid expression —
    stateless, so it must run unchanged under Structured Streaming and
    agree row-for-row with batch (fit happens offline; a stream scores
    with a frozen model, the standard train-offline/score-online split)."""
    import numpy as np

    from lanterndb_spark.operators.classifier import (
        FEATURE_COLS,
        LogRegModel,
        logreg_score,
        text_quality_features,
    )

    model = LogRegModel(
        FEATURE_COLS,
        np.array([30.0, 5.0, 0.1, 0.9, 0.1]),
        np.array([10.0, 2.0, 0.1, 0.1, 0.1]),
        np.array([0.8, -0.5, 1.2, 0.6, -1.5]),
        -0.25,
    )
    score = lambda df: logreg_score(
        text_quality_features(df, "text"), model, out_col="p"
    ).select("doc_id", F.round("p", 9).alias("p"))
    _run(score(_stream_docs(spark)), "logreg_stream")
    got = {r["doc_id"]: r["p"] for r in spark.sql("SELECT * FROM logreg_stream").collect()}
    want = {r["doc_id"]: r["p"] for r in score(tables["documents"]).collect()}
    assert got == want
