import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.maintenance import apply_tombstones, compact, with_deltas
from lanterndb_spark.streaming.events import stream_events
from lanterndb_spark.streaming.sessions import sessionize_batch, sessionize_stream

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


def _norm(rows):
    return {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], round(r["sum_value"], 6)
        )
        for r in rows
    }


def test_sessionize_batch_shapes(tables):
    ev = tables["events"]
    sess = sessionize_batch(ev, gap="30 minutes").cache()
    n_events = ev.count()
    agg = sess.agg(F.sum("n_events"), F.count("*")).first()
    assert agg[0] == n_events  # every event lands in exactly one session
    assert agg[1] <= n_events
    bad = sess.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0
    # sessions of one user don't overlap: starts sorted == merged
    one = sess.orderBy("user_id", "session_start").collect()
    per_user = {}
    for r in one:
        per_user.setdefault(r["user_id"], []).append(r)
    for rows in per_user.values():
        for a, b in zip(rows, rows[1:]):
            assert a["session_end"] < b["session_start"]


def test_sessionize_stream_converges_to_batch(spark, tables):
    stream = stream_events(spark, EVENTS_PATH, max_files_per_trigger=1)
    sess = sessionize_stream(stream, gap="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_upd")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode: the LAST emission per (user, session_start) is current
    updates = spark.sql("SELECT * FROM sessions_upd").collect()
    last = {}
    for r in updates:  # memory sink preserves arrival order
        last[(r["user_id"], r["session_start"])] = (
            r["session_end"], r["n_events"], round(r["sum_value"], 6)
        )
    batch = _norm(sessionize_batch(tables["events"], gap="30 minutes").collect())
    assert last == batch


def test_tombstones_and_deltas(tables):
    emb = tables["embeddings"]
    n = emb.count()
    dead = [0, 1, 2]
    alive = apply_tombstones(emb, dead, "vec_id")
    assert alive.count() == n - 3
    assert alive.filter(F.col("vec_id").isin(dead)).count() == 0
    # empty tombstone list is a no-op
    assert apply_tombstones(emb, [], "vec_id").count() == n

    delta = emb.limit(5).withColumn("vec_id", F.col("vec_id") + 100000)
    merged = with_deltas(emb, delta)
    assert merged.count() == n + 5

    clean = compact(emb, dead, "vec_id", delta)
    assert clean.count() == n + 5 - 3


def test_knn_skips_tombstoned(tables):
    from lanterndb_spark.operators.knn import knn

    emb = tables["embeddings"]
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = knn(emb, "embedding", q, k=3, id_col="vec_id").collect()
    assert top[0]["vec_id"] == 0
    alive = apply_tombstones(emb, [0], "vec_id")
    top2 = knn(alive, "embedding", q, k=3, id_col="vec_id").collect()
    assert all(r["vec_id"] != 0 for r in top2)
    # remaining order preserved (scan.c:294-300 skip semantics)
    assert [r["vec_id"] for r in top2[:2]] == [r["vec_id"] for r in top[1:3]]


def test_async_tasks(spark, tables):
    from lanterndb_spark.operators.tasks import AsyncTasks

    at = AsyncTasks(spark)
    tid = at.async_task("SELECT count(*) AS n FROM documents", name="count-docs")
    row = at.wait(tid, timeout=60)
    assert row["status"] == "done"
    assert row["duration_s"] is not None
    bad = at.async_task("SELECT * FROM no_such_table")
    row2 = at.wait(bad, timeout=60)
    assert row2["status"] == "failed" and "no_such_table" in row2["error_message"]
    tdf = at.tasks_df()
    assert tdf.count() == 2
    assert set(r["status"] for r in tdf.collect()) == {"done", "failed"}


def test_user_stopwords_roundtrip():
    from lanterndb_spark.functions.text import (
        STOPWORDS,
        get_user_stopwords,
        set_user_stopwords,
    )

    assert get_user_stopwords() == sorted(set(STOPWORDS)) or get_user_stopwords() == list(STOPWORDS)
    set_user_stopwords(["foo", "bar", "foo"])
    assert get_user_stopwords() == ["bar", "foo"]
    set_user_stopwords(None)
    assert get_user_stopwords() == list(STOPWORDS)


def test_embedding_job_stream_batches(tables):
    from lanterndb_spark.streaming.events import embedding_job_stream

    docs = tables["documents"].limit(40)
    write_batch, state = embedding_job_stream(docs)
    write_batch(docs.filter(F.col("doc_id") < 20), 0)
    write_batch(docs.filter(F.col("doc_id") >= 20), 1)
    assert state["batches"] == 2
    assert state["ok"].count() == 40
    assert state["failed"].count() == 0
    emb = state["ok"].first()["embedding"]
    assert len(emb) == 64


def test_sessionize_native_matches_lag_cumsum(tables):
    from lanterndb_spark.streaming.sessions import sessionize_batch, sessionize_native

    ev = tables["events"]
    a = _norm(sessionize_batch(ev, gap="30 minutes").collect())
    b = _norm(sessionize_native(ev, gap="30 minutes").collect())
    # strict-boundary ties (events exactly 30min apart) are the only
    # permitted difference; on this fixture there are none
    assert a == b
