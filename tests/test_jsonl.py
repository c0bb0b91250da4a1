"""JSONL source/sink: roundtrip, quarantine, deterministic sharding."""

import glob
import os

from pyspark.sql import functions as F

from lanterndb_spark.sources.jsonl import (
    corrupt_stats,
    read_jsonl,
    write_jsonl,
)


def test_roundtrip_preserves_corpus(spark, tables, tmp_path):
    docs = tables["documents"]
    path = str(tmp_path / "corpus")
    write_jsonl(docs, path, shards=4, shard_key="doc_id")
    back = read_jsonl(spark, path, keep_corrupt=False)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    df = read_jsonl(spark, str(p))
    stats = corrupt_stats(df).collect()[0]
    assert stats["n_rows"] == 3 and stats["n_corrupt"] == 1
    ok = df.filter(~F.col("_corrupt"))
    assert {r["doc_id"] for r in ok.collect()} == {1, 2}


def test_sharding_deterministic_under_reshuffle(spark, tables, tmp_path):
    docs = tables["documents"]
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_jsonl(docs, p1, shards=8, shard_key="doc_id")
    shuffled = docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    write_jsonl(shuffled, p2, shards=8, shard_key="doc_id")

    def shard_sets(path):
        out = {}
        for f in sorted(glob.glob(os.path.join(path, "part-*"))):
            idx = int(os.path.basename(f).split("-")[1])
            with open(f) as fh:
                ids = frozenset(line.split(":")[1].split(",")[0] for line in fh if line.strip())
            out[idx] = ids
        return out

    assert shard_sets(p1) == shard_sets(p2)
