"""Sequence packing: determinism, budget invariants, boundary flags."""

from collections import defaultdict

from pyspark.sql import functions as F

from lanterndb_spark.operators.packing import pack_contiguous, pack_first_fit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_contiguous_offsets_follow_cumsum(spark):
    # one bucket so the stream order is just doc_id order
    docs = _docs(
        spark,
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")],
    )
    got = {
        r["doc_id"]: r
        for r in pack_contiguous(docs, budget=4, n_buckets=1).collect()
    }
    # stream: doc1 tokens 0-2, doc2 3-4 (spans cut at 4), doc3 5-8, doc4 9
    assert (got[1]["seq"], got[1]["offset"]) == (0, 0)
    assert (got[2]["seq"], got[2]["offset"]) == (0, 3) and got[2]["spans_boundary"]
    assert (got[3]["seq"], got[3]["offset"]) == (1, 1) and got[3]["spans_boundary"]
    assert (got[4]["seq"], got[4]["offset"]) == (2, 1)


def test_contiguous_partition_independent(spark):
    docs = spark.range(500).select(
        F.col("id").cast("int").alias("doc_id"),
        F.concat(F.lit("tok "), F.repeat(F.lit("w "), (F.col("id") % 7).cast("int"))).alias("text"),
    )
    a = {r["doc_id"]: (r["bucket"], r["seq"], r["offset"]) for r in pack_contiguous(docs, 16).collect()}
    shuffled = docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    b = {r["doc_id"]: (r["bucket"], r["seq"], r["offset"]) for r in pack_contiguous(shuffled, 16).collect()}
    assert a == b


def test_first_fit_respects_budget(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 5, 2, 7, 1, 4, 6, 2])],
    )
    rows = pack_first_fit(docs, budget=8, n_buckets=1).collect()
    loads = defaultdict(list)
    for r in rows:
        loads[(r["bucket"], r["bin"])].append(r["n_tokens"])
    for sizes in loads.values():
        assert sum(sizes) <= 8
    # greedy first-fit in id order over one bucket:
    # 3->b0, 5->b0(8), 2->b1, 7->b2 (wait: 2+7>8) -> b2, 1->b1, 4->b1(7), 6->b3, 2->b2? 7+2>8 -> b3? 6+2==8 -> b3
    got = {r["doc_id"]: r["bin"] for r in rows}
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 1, 5: 1, 6: 3, 7: 3}


def test_first_fit_oversized_doc_gets_own_bin(spark):
    docs = _docs(spark, [(1, " ".join(["w"] * 20)), (2, "a b")])
    rows = {r["doc_id"]: r for r in pack_first_fit(docs, budget=8, n_buckets=1).collect()}
    assert rows[1]["bin"] != rows[2]["bin"]


def test_every_doc_packed_exactly_once(spark, tables):
    docs = tables["documents"]
    out = pack_contiguous(docs, budget=256)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    ff = pack_first_fit(docs, budget=256)
    assert ff.count() == docs.count()
