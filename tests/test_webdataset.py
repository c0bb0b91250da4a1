"""WebDataset tar-shard roundtrip: write from a DataFrame, read back
through the distributed parser, byte-compare every member."""

import tarfile

import pytest
from pyspark.sql import functions as F

from lanterndb_spark.sources.webdataset import read_wds_shards, write_wds_shards


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (f"doc{i:03d}", f"text body {i}", bytes([i % 256, (i * 7) % 256, 0xFF]))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "key string, text string, image binary")


def test_roundtrip(spark, tmp_path, samples):
    n = write_wds_shards(
        samples, str(tmp_path), "key", {"text": "txt", "image": "jpg"}, shards=4
    )
    assert n == 4
    back = read_wds_shards(spark, str(tmp_path)).collect()
    assert len(back) == 40
    want = {r["key"]: r for r in samples.collect()}
    for r in back:
        assert bytes(r["members"]["txt"]).decode() == want[r["key"]]["text"]
        assert bytes(r["members"]["jpg"]) == bytes(want[r["key"]]["image"])


def test_shards_are_valid_plain_tars(tmp_path, samples):
    write_wds_shards(samples, str(tmp_path), "key", {"text": "txt"}, shards=2)
    shard = sorted(tmp_path.glob("shard-*.tar"))[0]
    with tarfile.open(shard) as tar:  # external tooling can read the shards
        names = tar.getnames()
    assert all(n.endswith(".txt") for n in names)


def test_rewrite_clears_stale_shards(spark, tmp_path, samples):
    write_wds_shards(samples, str(tmp_path), "key", {"text": "txt"}, shards=8)
    write_wds_shards(samples, str(tmp_path), "key", {"text": "txt"}, shards=2)
    assert len(list(tmp_path.glob("shard-*.tar"))) == 2
    assert read_wds_shards(spark, str(tmp_path)).count() == 40


def test_member_pruning(spark, tmp_path, samples):
    write_wds_shards(samples, str(tmp_path), "key", {"text": "txt", "image": "jpg"}, shards=2)
    only_txt = read_wds_shards(spark, str(tmp_path), exts=["txt"]).collect()
    assert all(set(r["members"]) == {"txt"} for r in only_txt)


def test_deterministic_membership(spark, tmp_path, samples):
    write_wds_shards(samples, str(tmp_path / "a"), "key", {"text": "txt"}, shards=4)
    write_wds_shards(
        samples.orderBy(F.rand(1)), str(tmp_path / "b"), "key", {"text": "txt"}, shards=4
    )
    a = {(r["shard"], r["key"]) for r in read_wds_shards(spark, str(tmp_path / "a")).collect()}
    b = {(r["shard"], r["key"]) for r in read_wds_shards(spark, str(tmp_path / "b")).collect()}
    assert a == b  # md5-keyed shard assignment survives reshuffling
