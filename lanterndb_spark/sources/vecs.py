"""Readers for the standard ANN-benchmark vector file formats.

Reference: ``parse_fvecs`` / ``parse_ivecs`` / ``parse_bvecs`` SRFs
(lantern_extras/src/dotvecs.rs:32-138). Format per record: little-endian
u32 dimension prefix followed by dim elements (f32 / i32 / u8).

Spark recast: ``spark.read.format("binaryFile")`` picks up each file as
one row (path, content); a mapInPandas decoder explodes the payload into
(file, row_id, v) rows with numpy — Arrow-batched, no driver
materialization of vector data. Files are the unit of parallelism; for
multi-GB single files, split upstream or use the offset variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SPEC = {
    "fvecs": (np.float32, "array<float>"),
    "ivecs": (np.int32, "array<int>"),
    "bvecs": (np.uint8, "array<int>"),
}


def _decode(content: bytes, dtype) -> list:
    """Decode one .Xvecs payload into a list of vectors."""
    out = []
    itemsize = np.dtype(dtype).itemsize
    off = 0
    n = len(content)
    while off + 4 <= n:
        dim = int(np.frombuffer(content, dtype="<u4", count=1, offset=off)[0])
        off += 4
        nbytes = dim * itemsize
        if dim <= 0 or off + nbytes > n:
            raise ValueError(f"corrupt vecs record at offset {off - 4}: dim={dim}")
        out.append(np.frombuffer(content, dtype=dtype, count=dim, offset=off).tolist())
        off += nbytes
    return out


def _read_vecs(spark: SparkSession, path: str, kind: str) -> DataFrame:
    dtype, spark_type = _SPEC[kind]
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    schema = f"path string, row_id bigint, v {spark_type}"

    def decode_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                content = bytes(row["content"])
                # gzip transport like the reference's get_vectors
                # (dotvecs.rs:140-207) — detected by magic, not extension,
                # so .fvecs.gz and mislabeled files both work
                if content[:2] == b"\x1f\x8b":
                    import gzip

                    content = gzip.decompress(content)
                vecs = _decode(content, dtype)
                yield pd.DataFrame(
                    {
                        "path": row["path"],
                        "row_id": np.arange(len(vecs), dtype=np.int64),
                        "v": vecs,
                    }
                )

    return files.mapInPandas(decode_files, schema)


def read_fvecs(spark: SparkSession, path: str) -> DataFrame:
    """f32 vectors: (path, row_id, v array<float>)."""
    return _read_vecs(spark, path, "fvecs")


def read_ivecs(spark: SparkSession, path: str) -> DataFrame:
    """i32 vectors (ground-truth neighbor lists): (path, row_id, v array<int>)."""
    return _read_vecs(spark, path, "ivecs")


def read_bvecs(spark: SparkSession, path: str) -> DataFrame:
    """u8 vectors: (path, row_id, v array<int>)."""
    return _read_vecs(spark, path, "bvecs")


def write_fvecs(df: DataFrame, vec_col: str, local_path: str) -> int:
    """Export a vector column to a local .fvecs file (driver-side collect —
    test/interop helper, not a scale path). Returns row count."""
    rows = df.select(vec_col).collect()
    with open(local_path, "wb") as f:
        for r in rows:
            v = np.asarray(r[vec_col], dtype=np.float32)
            f.write(np.uint32(len(v)).tobytes())
            f.write(v.tobytes())
    return len(rows)


def write_fvecs_sharded(
    df: DataFrame, vec_col: str, dir_path: str, shards: int | None = None
) -> int:
    """Distributed .fvecs export: each task encodes its partition to one
    ``part-NNNNN.fvecs`` shard under ``dir_path`` — the scale path
    :func:`write_fvecs` (driver collect) is not. ``dir_path`` must be
    storage every executor can reach (shared FS / mount; trivially true
    on local mode). ``read_fvecs(dir_path)`` round-trips the shards.

    Returns the total row count (aggregated from per-shard receipts, so
    the job both writes and verifies in one pass).
    """
    import glob
    import os

    os.makedirs(dir_path, exist_ok=True)
    # re-runs with fewer partitions would otherwise leave stale shards from
    # a prior write, and read_fvecs(dir_path) would silently return extras
    for stale in glob.glob(os.path.join(dir_path, "part-*.fvecs")):
        os.remove(stale)
    src = df.select(F.col(vec_col).alias("v"))
    if shards is not None:
        src = src.repartition(shards)
    src = src.withColumn("__pid", F.spark_partition_id())

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: dict[int, list] = {}
        for pdf in batches:
            for pid, v in zip(pdf["__pid"], pdf["v"]):
                buf.setdefault(int(pid), []).append(v)
        for pid, vecs in buf.items():
            path = os.path.join(dir_path, f"part-{pid:05d}.fvecs")
            with open(path, "wb") as f:
                for v in vecs:
                    arr = np.asarray(list(v), dtype=np.float32)
                    f.write(np.uint32(len(arr)).tobytes())
                    f.write(arr.tobytes())
            yield pd.DataFrame({"shard": [pid], "rows": [len(vecs)]})

    receipts = src.mapInPandas(write_part, "shard int, rows bigint")
    total = receipts.agg(F.sum("rows").alias("n")).first()["n"]
    return int(total or 0)
