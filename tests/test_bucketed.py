"""Bucketed-layout plan assertions: the co-location contract is that a
join or aggregation on the bucket key plans with ZERO Exchange."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.sources.bucketed import (
    drop_bucketed,
    is_colocated_join,
    read_bucketed,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    write_bucketed(docs, "t_docs_b", "doc_id", buckets=8)
    write_bucketed(emb, "t_lab_b", "doc_id", buckets=8)
    yield "t_docs_b", "t_lab_b"
    drop_bucketed(spark, "t_docs_b")
    drop_bucketed(spark, "t_lab_b")


def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ld, lb = bucketed_pair
    old = _no_broadcast(spark)
    try:
        left, right = read_bucketed(spark, ld), read_bucketed(spark, lb)
        assert is_colocated_join(left, right, "doc_id")
        plan = (
            left.join(right, "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan and "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark, bucketed_pair):
    """Control: reading the same rows WITHOUT bucket metadata reintroduces
    the shuffle — proving the layout, not the data size, removes it."""
    ld, _ = bucketed_pair
    old = _no_broadcast(spark)
    try:
        docs_plain = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        emb_plain = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "label"
        )
        assert not is_colocated_join(docs_plain, emb_plain, "doc_id")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ld, _ = bucketed_pair
    t = read_bucketed(spark, ld)
    plan = (
        t.groupBy("doc_id").agg(F.count("*").alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bucketed_roundtrip_values(spark, bucketed_pair):
    ld, lb = bucketed_pair
    left, right = read_bucketed(spark, ld), read_bucketed(spark, lb)
    joined = left.join(right, "doc_id")
    plain = spark.read.parquet(f"{SF_DIR}/documents.parquet").join(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "label"
        ),
        "doc_id",
    )
    assert joined.count() == plain.count()
    a = {(r["doc_id"], r["label"]) for r in joined.select("doc_id", "label").collect()}
    b = {(r["doc_id"], r["label"]) for r in plain.select("doc_id", "label").collect()}
    assert a == b
