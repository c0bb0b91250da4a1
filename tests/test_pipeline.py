"""Full curation pipeline: rule precedence, packing over kept docs only,
partition independence, agreement with the standalone operators."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.pipeline import curation_pipeline

GOOD = "the quick brown fox jumps over the lazy dog and then it runs away home"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_rule_precedence_and_reasons(spark):
    rows = [
        (1, GOOD),                                  # kept
        (2, "too short"),                           # too_short
        (3, "x " * 30),                             # repetitive (dup bigrams)
        (4, GOOD + " mail me jane@example.com"),    # pii
        (5, GOOD),                                  # duplicate of 1
    ]
    out = {r["doc_id"]: r for r in curation_pipeline(_docs(spark, rows)).collect()}
    assert out[1]["reason"] == "kept" and out[1]["kept"]
    assert out[2]["reason"] == "too_short"
    assert out[3]["reason"] == "repetitive"
    assert out[4]["reason"] == "pii"
    assert out[5]["reason"] == "duplicate"
    assert all(not out[i]["kept"] and out[i]["split"] == "-" for i in (2, 3, 4, 5))


def test_contamination_rule(spark):
    bench = _docs(spark, [(100, GOOD)])
    # different doc_id, same text minus the tail -> shares 5-grams, but is
    # NOT an exact duplicate of anything in the corpus
    leaked = " ".join(GOOD.split()[:10])
    out = {
        r["doc_id"]: r
        for r in curation_pipeline(
            _docs(spark, [(1, leaked), (2, "completely fresh words about spark shuffles and windows at large cluster scale today")]),
            eval_df=bench,
        ).collect()
    }
    assert out[1]["reason"] == "contaminated"
    assert out[2]["reason"] == "kept"


def test_packing_skips_dropped_docs(spark):
    rows = [(1, GOOD), (2, "x"), (3, GOOD + " extra tail words here")]
    out = {
        r["doc_id"]: r
        for r in curation_pipeline(
            _docs(spark, rows), pack_budget=16, pack_buckets=1
        ).collect()
    }
    assert out[2]["seq"] is None and out[2]["offset"] is None
    kept = sorted(
        (i, out[i]) for i in out if out[i]["kept"]
    )
    # the token stream is contiguous over kept docs: each start equals the
    # previous kept doc's start + its tokens
    total = 0
    for i, r in kept:
        assert r["seq"] == total // 16 and r["offset"] == total % 16
        total += r["n_tokens"]


def test_partition_independent(spark, tables):
    docs = tables["documents"]
    base = curation_pipeline(docs).collect()
    shuffled = curation_pipeline(
        docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    ).collect()
    key = lambda rows: sorted(map(tuple, rows))
    assert key(base) == key(shuffled)


def test_agrees_with_standalone_curate_when_rules_overlap(spark, tables):
    from lanterndb_spark.operators.curate import curate

    docs = tables["documents"]
    pipe = {r["doc_id"]: r for r in curation_pipeline(docs).collect()}
    cur = {r["doc_id"]: r for r in curate(docs).collect()}
    for i, c in cur.items():
        p = pipe[i]
        # pipeline inserts pii/contaminated between repetitive and
        # duplicate; when the pipeline fires one of curate's rules the
        # verdicts must agree exactly
        if p["reason"] in ("too_short", "low_quality", "repetitive", "duplicate", "kept"):
            assert p["reason"] == c["reason"], i
            if p["kept"]:
                assert p["split"] == c["split"], i
