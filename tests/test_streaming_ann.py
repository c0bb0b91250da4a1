"""Streaming ANN ingest: vectors streamed through foreachBatch must be
(a) assigned to the same clusters the batch path assigns, (b) findable by
nprobe-pruned search immediately, (c) removed by tombstones, and (d) the
whole stream+compact lifecycle must converge to the batch-built view."""

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.ivf import build_ivf, ivf_assign, ivf_search_batch
from lanterndb_spark.streaming.ann import ann_ingest_stream

EMB_PATH = "/root/testdata/sf0.001/embeddings.parquet"
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


@pytest.fixture(scope="module")
def split(spark):
    df = spark.read.parquet(EMB_PATH)
    base = df.filter(F.col("vec_id") % 4 != 0).cache()
    new = df.filter(F.col("vec_id") % 4 == 0).cache()
    base.count(), new.count()
    return base, new


def _stream_new(spark, tmp_path, new):
    path = str(tmp_path / "new_vecs")
    # two files → two micro-batches
    new.repartition(2).write.mode("overwrite").parquet(path)
    return (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_stream_ingest_matches_batch_assign(spark, tmp_path, split):
    base, new = split
    idx = build_ivf(base, "embedding", nlist=8, seed=42)
    ingest = ann_ingest_stream(idx, id_col="vec_id")
    q = (
        _stream_new(spark, tmp_path, new)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert ingest.batches >= 2

    got = {
        r["vec_id"]: r["cluster_id"]
        for r in ingest.searchable().select("vec_id", "cluster_id").collect()
    }
    want_delta = {
        r["vec_id"]: r["cluster_id"]
        for r in ivf_assign(idx, new).select("vec_id", "cluster_id").collect()
    }
    want_base = {
        r["vec_id"]: r["cluster_id"]
        for r in idx.assigned.select("vec_id", "cluster_id").collect()
    }
    assert got == {**want_base, **want_delta}


def test_streamed_rows_searchable_and_tombstoned(spark, tmp_path, split):
    base, new = split
    idx = build_ivf(base, "embedding", nlist=8, seed=42)
    ingest = ann_ingest_stream(idx, id_col="vec_id")
    q = (
        _stream_new(spark, tmp_path, new)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # a streamed vector queried against the ingested index must return
    # ITSELF as the nearest neighbor (full probe → exact)
    probe_rows = new.orderBy("vec_id").limit(3).collect()
    probe = [[float(x) for x in r["embedding"]] for r in probe_rows]
    probe_ids = [r["vec_id"] for r in probe_rows]
    hits = ivf_search_batch(ingest.as_index(), probe, k=1, nprobe=8, id_col="vec_id")
    self_hits = {r["q_id"]: r["vec_id"] for r in hits.collect()}
    assert all(probe_ids[q] == v for q, v in self_hits.items())

    victim = probe_ids[0]
    ingest.delete([victim])
    hits2 = ivf_search_batch(ingest.as_index(), probe, k=1, nprobe=8, id_col="vec_id")
    ids2 = {r["vec_id"] for r in hits2.collect()}
    assert victim not in ids2

    # compact folds churn; the composed view equals the lifecycle result
    folded = ingest.compact()
    assert ingest.deltas == [] and ingest.tombstone_ids == []
    n_expected = base.count() + new.count() - 1
    assert folded.assigned.count() == n_expected


def test_batch_search_mid_ingest_matches_driver_form(spark, tmp_path, split):
    """stream==batch parity: after N ingest batches, the DataFrame-native
    batch search over the live view answers exactly what the driver-list
    form answers query-for-query — an eval pass can run mid-ingest."""
    base, new = split
    idx = build_ivf(base, "embedding", nlist=8, seed=42)
    ingest = ann_ingest_stream(idx, id_col="vec_id")
    q = (
        _stream_new(spark, tmp_path, new)
        .writeStream.foreachBatch(ingest.writer())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert ingest.batches >= 2

    # query batch mixes base rows and mid-stream-ingested rows
    probe_rows = (
        base.orderBy("vec_id").limit(8).collect()
        + new.orderBy("vec_id").limit(8).collect()
    )
    qdf = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in probe_rows],
        "q_id bigint, query array<double>",
    )
    from lanterndb_spark.operators.ivf import ivf_search
    from lanterndb_spark.plans.shape import release

    out = ingest.search_df(qdf, k=5, nprobe=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["q_id"], []).append((round(r["dist"], 9), r["vec_id"]))
    release(out)
    live = ingest.as_index()
    for r in probe_rows:
        want = [
            (round(x["dist"], 9), x["vec_id"])
            for x in ivf_search(
                live, [float(v) for v in r["embedding"]], k=5, nprobe=4,
                id_col="vec_id",
            ).collect()
        ]
        assert sorted(got[r["vec_id"]]) == sorted(want), f"q {r['vec_id']}"
    # tombstoned rows disappear from the batch view immediately
    dead = probe_rows[8]["vec_id"]  # an ingested row
    ingest.delete([dead])
    out2 = ingest.search_df(qdf, k=5, nprobe=8)
    assert all(r["vec_id"] != dead for r in out2.collect())
    release(out2)
