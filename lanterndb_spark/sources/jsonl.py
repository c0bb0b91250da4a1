"""JSONL document corpus source/sink — the LLM-pipeline interchange format.

Training corpora ship as sharded JSONL (one JSON object per line:
Dolma, RedPajama, FineWeb, c4 all use it). Spark's native JSON reader
already does the heavy lifting distributed and with full pushdown; this
module pins the conventions that make corpus exchange reproducible:

- an EXPLICIT schema (schema inference re-scans the data and silently
  unifies drifting shards — at 100 TB that's both a wasted pass and a
  correctness hazard);
- ``_corrupt_record`` quarantine instead of dropped rows: bad lines are
  kept, flagged, and countable (the embed-pipeline quarantine pattern,
  operators/embed.py);
- deterministic sharding on write: ``repartition(n, key)`` so shard
  membership is a pure function of the id, not of the input layout —
  re-exporting a reshuffled corpus produces identical shards
  (operators/sampling.py's reproducibility argument);
- optional zstd/gzip codecs (line-splittable only when uncompressed —
  compressed shards parallelize per FILE, so shard count is the
  parallelism floor; the writer makes that explicit).

No reference analogue (the reference ingests via SQL/COPY); this is
training-pipeline plumbing (README "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema.

    Returns the schema's columns plus ``_corrupt`` (bool). Malformed
    lines survive with NULL fields and ``_corrupt = true`` when
    ``keep_corrupt``; they are dropped otherwise.
    """
    if not keep_corrupt:
        # no corrupt column at all: DROPMALFORMED discards bad lines at
        # the scan, which also sidesteps Spark's corrupt-only-query rule
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    full = f"{schema}, {CORRUPT} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
    )
    first_col = schema.split(",")[0].strip().split(" ")[0]
    # the coalesce term is always false, but it is NOT constant-foldable
    # (depends on data), so it keeps a DATA column in the pruned scan
    # schema — Spark refuses queries whose referenced columns are ONLY
    # the corrupt record (QUERY_ONLY_CORRUPT_RECORD_COLUMN); without
    # this, counting the corrupt rate would require caching the frame
    flag = F.col(CORRUPT).isNotNull() | F.coalesce(
        F.length(F.col(first_col).cast("string")) < -1, F.lit(False)
    )
    return df.withColumn("_corrupt", flag).drop(CORRUPT)


def write_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    shard_key: str | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as (optionally sharded, optionally compressed)
    JSONL. With ``shard_key``, shard membership is hash(key) — stable
    under input reshuffles; without it, the current partitioning is
    kept. Compressed output trades line-splittability for size: readers
    parallelize per shard, so pick ``shards`` >= target cluster cores."""
    out = df
    if shards is not None:
        out = (
            df.repartition(int(shards), F.col(shard_key))
            if shard_key
            else df.repartition(int(shards))
        )
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def corrupt_stats(df: DataFrame) -> DataFrame:
    """One-row audit of a ``read_jsonl(keep_corrupt=True)`` result:
    ``n_rows, n_corrupt, corrupt_rate``."""
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("_corrupt").cast("long")).alias("n_corrupt"),
        F.round(F.avg(F.col("_corrupt").cast("double")), 6).alias("corrupt_rate"),
    )
