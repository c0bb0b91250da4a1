import numpy as np
import pytest

from lanterndb_spark.sources.vecs import read_fvecs, read_ivecs, write_fvecs, _decode


def _write_vecs(path, vecs, dtype):
    with open(path, "wb") as f:
        for v in vecs:
            a = np.asarray(v, dtype=dtype)
            f.write(np.uint32(len(a)).tobytes())
            f.write(a.tobytes())


def test_fvecs_roundtrip(spark, tmp_path):
    vecs = [[1.5, -2.0, 3.25], [0.0, 1.0, 2.0], [9.0, 8.0, 7.0]]
    p = str(tmp_path / "test.fvecs")
    _write_vecs(p, vecs, np.float32)
    df = read_fvecs(spark, p)
    rows = sorted(df.collect(), key=lambda r: r["row_id"])
    for r, expect in zip(rows, vecs):
        assert r["v"] == pytest.approx(expect)
    assert [r["row_id"] for r in rows] == [0, 1, 2]


def test_ivecs(spark, tmp_path):
    vecs = [[1, 2, 3, 4], [5, 6, 7, 8]]
    p = str(tmp_path / "truth.ivecs")
    _write_vecs(p, vecs, np.int32)
    rows = sorted(read_ivecs(spark, p).collect(), key=lambda r: r["row_id"])
    assert [r["v"] for r in rows] == vecs


def test_corrupt_record_raises():
    import struct
    bad = struct.pack("<I", 1000) + b"\x00" * 8  # claims 1000 floats, has 2
    with pytest.raises(ValueError, match="corrupt"):
        _decode(bad, np.float32)


def test_write_fvecs_roundtrip(spark, tables, tmp_path):
    emb = tables["embeddings"].limit(5)
    p = str(tmp_path / "out.fvecs")
    n = write_fvecs(emb, "embedding", p)
    assert n == 5
    back = read_fvecs(spark, p)
    assert back.count() == 5
    assert len(back.first()["v"]) == 64


def test_fvecs_gzip_roundtrip(spark, tmp_path):
    # gzip transport parity with the reference's get_vectors loader
    import gzip

    from lanterndb_spark.sources.vecs import read_fvecs, write_fvecs

    df = spark.createDataFrame(
        [(i, [float(i), float(i) + 0.5]) for i in range(7)], "id int, v array<float>"
    )
    raw = tmp_path / "t.fvecs"
    write_fvecs(df, "v", str(raw))
    gz = tmp_path / "t.fvecs.gz"
    gz.write_bytes(gzip.compress(raw.read_bytes()))
    plain = {tuple(r["v"]) for r in read_fvecs(spark, str(raw)).collect()}
    gzipped = {tuple(r["v"]) for r in read_fvecs(spark, str(gz)).collect()}
    assert gzipped == plain and len(plain) == 7


def test_write_fvecs_sharded_roundtrip(spark, tables, tmp_path):
    from lanterndb_spark.sources.vecs import read_fvecs, write_fvecs_sharded

    emb = tables["embeddings"].limit(120)
    out_dir = str(tmp_path / "shards")
    n = write_fvecs_sharded(emb, "embedding", out_dir, shards=4)
    assert n == 120
    import glob
    assert 1 <= len(glob.glob(out_dir + "/part-*.fvecs")) <= 4
    back = read_fvecs(spark, out_dir + "/*.fvecs")
    got = sorted(tuple(round(float(x), 5) for x in r["v"]) for r in back.collect())
    want = sorted(
        tuple(round(float(x), 5) for x in r["embedding"]) for r in emb.collect()
    )
    assert got == want
