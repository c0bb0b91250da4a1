"""WebDataset-style tar-shard export/import for multimodal training data.

The de-facto interchange format for large-scale multimodal training
(image/audio/text corpora are shipped as directories of .tar shards whose
members are ``<key>.<ext>`` files; loaders stream shards sequentially).
Not in the reference (its vector-file surface is .fvecs — see
sources/vecs.py); this rounds out the training-pipeline export path next
to the sharded .fvecs writer.

Spark shapes, stdlib ``tarfile`` only:

- write: one tar per partition, written DIRECTLY by the executor task to
  ``dir_path`` (which must be a storage location all executors can reach
  — true in local mode and on shared-mount/object-FS clusters); only
  per-shard (name, row-count) stats flow back, so no sample byte ever
  crosses the driver. Partitioning controls shard membership: pass
  ``shards=N`` to repartition by md5 of the key (deterministic,
  reshuffle-stable), or pre-partition/sort upstream for curriculum
  order.
- read: ``binaryFile`` picks up each shard as one row; a mapInPandas
  parser explodes members and regroups them per key into a
  (key, ext→binary) map. Shards are the unit of parallelism, exactly how
  WebDataset loaders consume them.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_wds_shards(
    df: DataFrame,
    dir_path: str,
    key_col: str,
    members: dict[str, str],
    shards: int | None = None,
    prefix: str = "shard",
) -> int:
    """Write ``df`` as WebDataset tar shards under ``dir_path``.

    ``members`` maps column → member extension, e.g.
    ``{"text": "txt", "image": "jpg", "meta": "json"}``; string columns
    are utf-8 encoded, binary columns written as-is. Returns the number
    of shards written. Stale ``<prefix>-*.tar`` files are cleared first
    (same contract as write_fvecs_sharded)."""
    os.makedirs(dir_path, exist_ok=True)
    for f in os.listdir(dir_path):
        if f.startswith(f"{prefix}-") and f.endswith(".tar"):
            os.remove(os.path.join(dir_path, f))
    cols = [key_col] + list(members)
    data = df.select(*cols)
    if shards is not None:
        data = data.repartition(shards, F.md5(F.col(key_col).cast("string")))

    exts = dict(members)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"{prefix}-{pid:05d}.tar"
        tmp = os.path.join(dir_path, f".{name}.tmp")
        n = 0
        with tarfile.open(tmp, mode="w") as tar:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    key = str(row[key_col])
                    for col, ext in exts.items():
                        v = row[col]
                        if v is None:
                            continue
                        payload = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(payload)
                        tar.addfile(info, io.BytesIO(payload))
                    n += 1
        if n == 0:
            os.remove(tmp)
            return
        os.replace(tmp, os.path.join(dir_path, name))  # atomic publish
        yield pd.DataFrame({"shard": [name], "n": [n]})

    stats = data.mapInPandas(build, "shard string, n long").collect()
    return len(stats)


def read_wds_shards(
    spark: SparkSession, dir_path: str, exts: list[str] | None = None
) -> DataFrame:
    """(key, shard, members map<ext, binary>) — one row per sample.

    ``exts`` optionally restricts which member extensions are kept
    (column pruning for tar members)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(dir_path)
        .select("path", "content")
    )
    keep = set(exts) if exts else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                shard = os.path.basename(r["path"])
                with tarfile.open(fileobj=io.BytesIO(bytes(r["content"]))) as tar:
                    per_key: dict[str, dict[str, bytes]] = {}
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        if not dot:
                            key, ext = m.name, ""
                        if keep is not None and ext not in keep:
                            continue
                        per_key.setdefault(key, {})[ext] = tar.extractfile(m).read()
                    for key, mm in per_key.items():
                        rows.append({"key": key, "shard": shard, "members": mm})
            if rows:
                yield pd.DataFrame(rows)

    return raw.mapInPandas(parse, "key string, shard string, members map<string, binary>")
