"""Size-targeted parquet writes — file-count control for 100 TB outputs.

At cluster scale the silent output killer is file geometry, not values:
a 2000-task stage writing a small dimension emits 2000 tiny files
(metadata pressure, slow listings, degraded scans), while one task
writing a huge partition emits a multi-GB file that downstream readers
can't split across row groups they want. The fix is always the same —
repartition to ``ceil(bytes / target)`` before the write — but the bytes
aren't known until written. This module measures instead of guessing:
write a bounded SAMPLE, read its on-disk size (real encoding + real
compression, the things in-memory estimates get wrong), scale to the
full row count, then write with the computed file count.

Cost: one sample write (bounded rows) + one count + the real write —
the same passes a hand-tuned pipeline does, minus the hand-tuning.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def estimate_parquet_bytes_per_row(
    df: DataFrame, sample_dir: str, sample_rows: int = 10_000
) -> float:
    """Measured parquet bytes/row: write ``sample_rows`` rows, stat the
    files. Compression-aware by construction (a text column with 10×
    zstd ratio and a random-float embedding column land where they
    actually land)."""
    sample = df.limit(sample_rows)
    sample.coalesce(1).write.mode("overwrite").parquet(sample_dir)
    n = sample.count()
    if n == 0:
        raise ValueError("cannot size an empty DataFrame")
    bytes_total = _dir_bytes(sample_dir)
    return bytes_total / n


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    partition_by: str | list[str] | None = None,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as parquet with files sized ~``target_mb``.

    Without ``partition_by``: round-robin repartition to the computed
    file count. With it: repartition on the partition columns (plus a
    within-partition salt when a single partition needs several files)
    so each task writes whole partition-dirs — the tasks×partitions
    small-file explosion is the classic mistake here.

    Returns {rows, est_bytes_per_row, n_files} for observability.
    """
    spark = df.sparkSession
    sample_dir = path.rstrip("/") + "__sizing_sample"
    try:
        bpr = estimate_parquet_bytes_per_row(df, sample_dir, sample_rows)
    finally:
        shutil.rmtree(sample_dir, ignore_errors=True)
    rows = df.count()
    n_files = max(1, math.ceil(rows * bpr / (target_mb * 1024 * 1024)))

    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        # salt only as far as needed: files-per-partition ≈ n_files spread
        # over the distinct partition values
        n_parts = df.select(*cols).distinct().count() or 1
        per_part = max(1, math.ceil(n_files / n_parts))
        out = df.withColumn(
            "__fsplit", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(per_part))
        ).repartition(n_parts * per_part, *[F.col(c) for c in cols], F.col("__fsplit"))
        out.drop("__fsplit").write.mode(mode).partitionBy(*cols).parquet(path)
    else:
        df.repartition(n_files).write.mode(mode).parquet(path)
    return {"rows": rows, "est_bytes_per_row": round(bpr, 2), "n_files": n_files}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
