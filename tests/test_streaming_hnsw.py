"""Streaming HNSW ingest (streaming/hnsw.py): the graphs must grow in
place per micro-batch (aminsert) and converge to the batch-built index
— post-ingest search over base ∪ streamed rows equals the full batch
build's results under full probe."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search
from lanterndb_spark.operators.knn import knn
from lanterndb_spark.streaming.hnsw import hnsw_ingest_stream

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def test_stream_grows_graphs_and_converges(spark, tmp_path, tables):
    emb = tables["embeddings"]
    base = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)
    idx = build_hnsw(
        base.select("vec_id", "embedding"), "embedding", id_col="vec_id",
        m=8, ef_construction=64, num_shards=2, seed=42,
    )
    ingest = hnsw_ingest_stream(idx)
    src = str(tmp_path / "vec_stream")
    arriving.repartition(3).write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("vec_id", "embedding")
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert ingest.batches == 3
    n = emb.count()
    assert ingest.index.graphs.agg(F.sum("n")).first()[0] == n

    # full probe over the grown graphs == exact knn over the whole table
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    got = [r["vec_id"] for r in ingest.search(emb, qv, k=10, ef=n).collect()]
    want = [r["vec_id"] for r in knn(emb, "embedding", qv, k=10, id_col="vec_id").collect()]
    assert got == want

    # tombstone then vacuum
    ingest.delete([1])
    got2 = [r["vec_id"] for r in ingest.search(emb, qv, k=5, ef=64).collect()]
    assert 1 not in got2
    folded = ingest.compact()
    assert folded.graphs.agg(F.sum("n")).first()[0] == n - 1
    got3 = [r["vec_id"] for r in
            hnsw_search(folded, emb, qv, k=5, ef=64).collect()]
    assert got3 == got2

    # replay guard: re-delivering the LAST batch_id (a foreachBatch
    # retry) is a silent no-op...
    before = ingest.index.graphs.agg(F.sum("n")).first()[0]
    last = ingest._last_batch_id
    ingest.writer()(arriving.limit(5).select("vec_id", "embedding"), last)
    assert ingest.index.graphs.agg(F.sum("n")).first()[0] == before
    # ...but a batch_id going BACKWARDS means a fresh query (ids restart
    # at 0) got wired to this handle — silent skip would drop its data,
    # so the handle raises (one-query-per-handle contract)
    import pytest

    with pytest.raises(RuntimeError, match="batch_id regression"):
        ingest.writer()(arriving.limit(5).select("vec_id", "embedding"), 0)
    assert ingest.index.graphs.agg(F.sum("n")).first()[0] == before
    ingest.index.graphs.unpersist()


def test_batch_search_df_mid_ingest_matches_driver_form(spark, tmp_path, tables):
    """stream==batch parity on the graph backend: mid-ingest, the
    DataFrame-native batch search (tombstones applied, string q_ids via
    the surrogate wrap) answers exactly what the driver-list form does."""
    emb = tables["embeddings"]
    base = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)
    idx = build_hnsw(
        base.select("vec_id", "embedding"), "embedding", id_col="vec_id",
        m=8, ef_construction=64, num_shards=2, seed=42,
    )
    ingest = hnsw_ingest_stream(idx)
    src = str(tmp_path / "vec_stream_df")
    arriving.repartition(2).write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("vec_id", "embedding")
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert ingest.batches >= 2
    ingest.delete([2, 3])  # one base row, one streamed row

    probe_rows = emb.filter(F.col("vec_id").isin([0, 1, 7])).collect()
    qs = [[float(x) for x in r["embedding"]] for r in probe_rows]
    want = {}
    for r in ingest.search_batch(qs, k=5, ef=64).collect():
        want.setdefault(r["q_id"], []).append((round(r["dist"], 9), r["vec_id"]))
    # string-keyed query frame through the live view
    qdf = spark.createDataFrame(
        [(f"p{i}", q) for i, q in enumerate(qs)],
        "q_id string, query array<double>",
    )
    got = {}
    for r in ingest.search_df(qdf, k=5, ef=64).collect():
        got.setdefault(r["q_id"], []).append((round(r["dist"], 9), r["vec_id"]))
    assert set(got) == {f"p{i}" for i in range(len(qs))}
    for i in range(len(qs)):
        assert sorted(got[f"p{i}"]) == sorted(want[i]), f"q {i}"
    assert all(v not in {2, 3} for vs in got.values() for _, v in vs)
