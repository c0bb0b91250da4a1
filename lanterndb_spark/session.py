"""SparkSession factory with scale-appropriate defaults.

Defaults target the driver's local[32] test rig but are chosen to be the
same knobs you would set on a 1000-executor cluster: AQE on (runtime
coalescing + skew-join splitting), Arrow transfer on for the pandas-UDF
paths, and shuffle partitions sized to the parallelism rather than the
Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_spark(
    app_name: str = "lanterndb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type, so read as long and convert in load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables as a dict of DataFrames and register
    them as temp views (so ``spark.sql`` works over the same names DuckDB
    uses in the oracle)."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    # set here too (not only in get_spark) so a caller-provided session —
    # e.g. the driver's — can read the nanos-timestamp events table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            # nanos timestamps arrive as long (see get_spark); truncate to
            # microseconds exactly like DuckDB truncates ns -> its us TIMESTAMP
            for field in df.schema.fields:
                if field.name == "ts" and field.dataType.simpleString() == "bigint":
                    # integer div — float division would lose precision at ~1e18 ns
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            df.createOrReplaceTempView(n)
            out[n] = df
    return out
