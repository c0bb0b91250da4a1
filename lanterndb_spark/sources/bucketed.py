"""Bucketed table layout — co-located joins without per-query shuffles.

Beyond-reference scale feature (the reference's Postgres storage gets
physical co-location implicitly from btree organization and merge-join
plans; a 100 TB Spark deployment has to OPT IN via bucketing): a table
written with ``bucketBy(n, key)`` + ``sortBy(key)`` is hash-partitioned
into a fixed number of buckets ON DISK, so every later equi-join or
aggregation on that key runs with ZERO Exchange — the sort-merge join
reads co-bucketed files directly. For the pipelines in this engine the
candidates are the fact keys joined repeatedly: ``doc_id`` (postings ↔
documents ↔ curation verdicts), ``vec_id`` (embeddings ↔ assignments ↔
tombstones), ``o_orderkey``/``user_id`` on the relational/event spine.

Rules of thumb encoded here:
- bucket count is fixed at write time and should be sized so one bucket
  ≈ 100-200 MB at the target scale (buckets are the parallelism floor
  for bucketed scans);
- BOTH join sides must be bucketed on the join key with the SAME bucket
  count (Spark does not yet coalesce mismatched counts for free);
- writes must avoid tiny files: repartition by the bucket key first so
  each task writes each bucket once, not |tasks|×|buckets| files.

Spark-native: ``saveAsTable`` with the session catalog (no Hive needed);
``spark.sql.sources.bucketing.enabled`` (default true) turns the layout
into Exchange-free plans, and equality filters on the bucket key prune
to a single bucket (``spark.sql.sources.bucketing.autoBucketedScan``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. Joins/aggs on ``key`` against other tables bucketed with the
    same ``buckets`` then plan with no Exchange on either side.

    The pre-write ``repartition(buckets, key)`` makes each task own whole
    buckets: without it every write task emits a file per bucket it sees
    (tasks×buckets small files — the classic bucketed-write mistake).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.repartition(buckets, *[F.col(k) for k in keys])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, keys[0], *keys[1:])
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (plain
    ``spark.read.parquet`` on the files would lose the layout and
    reintroduce shuffles)."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def is_colocated_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> bool:
    """True when ``left.join(right, on)`` plans with zero Exchange — the
    check tests the PLAN, not the catalog, so it also covers one-side
    broadcasts and pre-partitioned frames."""
    joined = left.join(right, on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
