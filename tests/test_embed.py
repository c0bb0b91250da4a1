import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.embed import (
    JobRegistry,
    embed,
    get_available_models,
    get_available_runtimes,
    quarantine_failed,
)
from lanterndb_spark.functions.multimodal import (
    attach_media_meta,
    decode_image,
    image_embedding,
    sample_frames,
)


def test_registry_discovery():
    # discovery surface mirroring get_available_models/runtimes (embeddings.rs:201-225)
    assert "clip/ViT-B-32-visual" in get_available_models()
    assert set(get_available_runtimes()) >= {"ort", "openai", "cohere", "hash"}


def test_hash_embed_deterministic_normalized(spark):
    df = spark.createDataFrame([("hello",), ("world",), ("hello",)], "t string")
    rows = embed(df, "t", model="hash/debug-64").collect()
    by_text = {}
    for r in rows:
        v = r["embedding"]
        assert len(v) == 64
        assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-3)
        by_text.setdefault(r["t"], []).append(v)
    assert by_text["hello"][0] == by_text["hello"][1]  # deterministic
    assert by_text["hello"][0] != by_text["world"][0]


def test_null_text_quarantined(spark):
    df = spark.createDataFrame([("ok",), (None,)], "t string")
    out = embed(df, "t")
    ok, failed = quarantine_failed(out)
    assert ok.count() == 1 and failed.count() == 1


def test_stubbed_runtime_raises(spark):
    df = spark.createDataFrame([("x",)], "t string")
    out = embed(df, "t", model="BAAI/bge-small-en")  # ort runtime stub
    with pytest.raises(Exception, match="NotImplemented|needs its model"):
        out.collect()


def test_unknown_model_and_runtime(spark):
    df = spark.createDataFrame([("x",)], "t string")
    with pytest.raises(ValueError):
        embed(df, "t", model="nope/nope")
    with pytest.raises(ValueError):
        embed(df, "t", runtime="quantum")


def test_job_registry_lifecycle(spark):
    reg = JobRegistry()
    jid = reg.add_embedding_job("docs", "t", "emb")
    assert reg.get_status(jid) == "queued"
    df = spark.createDataFrame([("a",), ("b",)], "t string")
    out = reg.run(jid, df)
    assert out.filter(F.col("emb").isNotNull()).count() == 2
    assert reg.get_status(jid) == "done"
    jid2 = reg.add_embedding_job("docs", "t", "emb")
    reg.cancel(jid2)
    with pytest.raises(ValueError):
        reg.run(jid2, df)


@pytest.fixture()
def media_df(spark):
    return spark.createDataFrame(
        [(1, b"\x01\x02imagebytes" * 10), (2, b"\x09\x08othervid" * 20)],
        "id int, data binary",
    )


def test_media_meta_schema(media_df):
    out = attach_media_meta(media_df, "data", kind="image", mime="image/png")
    row = out.first()
    assert row["media_meta"]["kind"] == "image"
    assert row["media_meta"]["width"] is None


def test_decode_image_stub_contract(media_df):
    with pytest.raises(Exception, match="NotImplemented|codec"):
        decode_image(media_df, "data").collect()
    out = decode_image(media_df, "data", width=4, height=4, fake=True)
    rows = out.collect()
    assert all(len(r["pixels"]) == 4 * 4 * 3 for r in rows)
    again = decode_image(media_df, "data", width=4, height=4, fake=True).collect()
    assert [r["pixels"] for r in rows] == [r["pixels"] for r in again]  # deterministic


def test_image_embedding_stub(media_df):
    out = image_embedding(media_df, "data", fake=True)
    v = out.first()["embedding"]
    assert len(v) == 512
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-3)


def test_sample_frames_stub(media_df):
    out = sample_frames(media_df, "data", max_frames=4, fake=True)
    for r in out.collect():
        assert 1 <= len(r["frames"]) <= 4


def test_complete_echo_runtime(tables):
    from lanterndb_spark.operators.embed import complete

    docs = tables["documents"].limit(10)
    out = complete(docs, "text", model="echo/debug", system_prompt="sys").collect()
    assert all(r["completion"].startswith("sys|") for r in out)
    # deterministic per text
    again = complete(tables["documents"].limit(10), "text", model="echo/debug",
                     system_prompt="sys").collect()
    assert {r["doc_id"]: r["completion"] for r in out} == {
        r["doc_id"]: r["completion"] for r in again
    }


def test_completion_job_registry(tables):
    from lanterndb_spark.operators.embed import JobRegistry

    reg = JobRegistry()
    jid = reg.add_completion_job("documents", "text", "summary", system_prompt="s")
    assert reg.get_status(jid) == "queued"
    out = reg.run(jid, tables["documents"].limit(5))
    assert "summary" in out.columns and out.count() == 5
    assert reg.get_status(jid) == "done"


def test_registered_client_activates_stubbed_runtime(spark):
    """register_embedding_client plugs a real model call into the ort
    slot: the whole pipeline (Arrow batching, NULL quarantine, model
    dim) runs unchanged through the user's callable — the swap the
    stub docstring promises, without editing the library."""
    from lanterndb_spark.operators.embed import (
        embed, quarantine_failed, register_embedding_client,
    )

    def fake_ort(texts, model, dim):
        # deterministic, dim-aware, quarantines empty strings
        return [
            None if t is None or not t else [float(len(t))] * dim
            for t in texts
        ]

    register_embedding_client("ort", fake_ort)
    try:
        df = spark.createDataFrame(
            [(1, "alpha"), (2, ""), (3, None), (4, "zz")], "id int, text string"
        )
        out = embed(df, "text", model="BAAI/bge-small-en")  # ort, dim 384
        ok, failed = quarantine_failed(out)
        ok_rows = {r["id"]: r["embedding"] for r in ok.collect()}
        assert set(ok_rows) == {1, 4}
        assert len(ok_rows[1]) == 384 and ok_rows[1][0] == 5.0
        assert sorted(r["id"] for r in failed.collect()) == [2, 3]
    finally:
        register_embedding_client("ort", None)
    # unregistered again -> back to the raise-at-call stub
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    stub = embed(df, "text", model="BAAI/bge-small-en")
    with _pytest.raises(Exception) as ei:
        stub.collect()
    assert "register_embedding_client" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


def test_registered_completion_client(tables):
    from pyspark.sql import functions as F

    from lanterndb_spark.operators.embed import (
        complete, register_completion_client,
    )

    register_completion_client(
        "openai", lambda texts, model, sp: [
            None if t is None else f"{model}:{sp}:{t[:3]}" for t in texts
        ]
    )
    try:
        docs = tables["documents"].select("doc_id", "text").limit(3)
        out = complete(docs, "text", model="gpt-4o", system_prompt="s")
        rows = out.collect()
        assert all(r["completion"].startswith("gpt-4o:s:") for r in rows)
    finally:
        register_completion_client("openai", None)


def test_registered_codec_activates_multimodal_stages(media_df):
    """register_codec plugs real decoders into the three stubbed stages:
    the mapInPandas/pandas_udf plumbing (schema, batching, quarantine)
    runs the user's callable unchanged — and unregistering restores the
    raise-at-call stub."""
    from lanterndb_spark.functions.multimodal import (
        decode_image, image_embedding, register_codec, sample_frames,
    )

    register_codec(
        "image_decode",
        lambda blobs, w, h: [[len(b) % 256] * (w * h * 3) for b in blobs],
    )
    register_codec(
        "image_embedding",
        lambda blobs, model, dim: [[float(b[0] if b else 0)] * dim for b in blobs],
    )
    register_codec(
        "video_frames",
        lambda blobs, every_n, max_frames: [[b[:4]] * min(2, max_frames) for b in blobs],
    )
    try:
        decoded = decode_image(media_df, "data", width=4, height=2)
        rows = decoded.collect()
        assert all(len(r["pixels"]) == 4 * 2 * 3 for r in rows)
        emb = image_embedding(media_df, "data", dim=8).collect()
        assert all(len(r["embedding"]) == 8 for r in emb)
        fr = sample_frames(media_df, "data", max_frames=4).collect()
        assert all(len(r["frames"]) == 2 for r in fr)
    finally:
        register_codec("image_decode", None)
        register_codec("image_embedding", None)
        register_codec("video_frames", None)
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_image(media_df, "data", width=4, height=2).collect()


def test_register_completion_client_validates_runtime():
    """A typoed completion runtime raises at registration, not silently
    at call time via the stub's NotImplementedError (the embedding
    registry's contract, mirrored)."""
    import pytest

    from lanterndb_spark.operators.embed import register_completion_client

    with pytest.raises(ValueError, match="unknown completion runtime"):
        register_completion_client("opnai", lambda t, m, s: t)
    with pytest.raises(ValueError, match="unknown completion runtime"):
        register_completion_client("ort", lambda t, m, s: t)  # embed-only runtime
