"""Streaming sketch rollups — incremental approximate aggregates.

The batch sketch module (functions/sketches.py) builds mergeable HLL
states at the finest grain; this module keeps those states CURRENT as
data arrives, without ever reprocessing history. Pattern matches
``incremental_postings_stream`` (streaming/events.py): per-micro-batch
partial state appended to a store, a consolidate step that merges —
except sketch states union losslessly, so "consolidate" is just
``hll_rollup`` and the store never needs compaction for correctness
(compact when file counts annoy you, not for the math).

At 100 TB/day: each micro-batch contributes O(groups · 2^lgk) bytes of
state regardless of batch row count. The rollup query reads kilobytes
per group per batch — dashboard-refresh cheap — while an exact
streaming ``countDistinct`` would hold every key in state forever.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lanterndb_spark.functions.sketches import DEFAULT_LGK, hll_rollup, hll_sketches


def sketch_rollup_stream(
    groups: Sequence[str] | str,
    col: str,
    store_dir: str,
    lgk: int = DEFAULT_LGK,
) -> tuple[Callable[[DataFrame, int], None], Callable[[SparkSession], DataFrame]]:
    """Incremental distinct-count machinery for a stream.

    Returns ``(write_batch, distinct_counts)``:

    - ``write_batch`` goes into ``stream.writeStream.foreachBatch(...)``;
      each micro-batch appends its per-group HLL states (plus
      ``batch_id``) to ``store_dir`` — the only state that persists.
    - ``distinct_counts(spark)`` merges every stored state per group and
      returns ``groups..., sketch, n_distinct_est`` — exactly
      ``hll_rollup`` over the store, callable any time, including while
      the stream runs.
    """
    gcols = [groups] if isinstance(groups, str) else list(groups)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            hll_sketches(batch_df, gcols, col, lgk)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(store_dir)
        )

    def distinct_counts(spark: SparkSession) -> DataFrame:
        return hll_rollup(spark.read.parquet(store_dir), gcols)

    return write_batch, distinct_counts


def windowed_distinct_users(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    col: str = "user_id",
    rsd: float = 0.02,
) -> DataFrame:
    """Watermarked tumbling-window approximate distinct — the pure
    streaming-aggregation variant (HLL++ partials live in the state
    store, bounded by the watermark; closed windows emit and evict).
    Output: ``bucket_start, event_type, n_distinct_est``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct(col, rsd).alias("n_distinct_est"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type",
            "n_distinct_est",
        )
    )
