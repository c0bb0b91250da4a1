"""One-call corpus curation — the composed training-data filter chain.

Every large-scale pretraining pipeline runs the same gauntlet: drop
too-short docs, drop low-quality docs, drop repetitive/boilerplate docs,
drop exact duplicates, then split survivors into train/val/test. The
pieces all exist in this engine (functions/text.py quality +_repetition
signals, operators/dedup.py, operators/sampling.py); this operator
composes them into one auditable pass with a per-document verdict —
kept-or-not plus the FIRST rule that fired, so corpus loss is
attributable per rule.

Scale shape: the signal computation is a pure projection (column HOFs);
the only shuffle is the exact-dup window, partitioned by a 128-bit
content hash (uniform, duplicate-group-sized partitions); the split
assignment is again a projection. One shuffle total for the whole
gauntlet — the filters ride the same scan.

Thresholds compare ROUNDED (6dp) signal values so the decision is
bit-reproducible across engines (the DuckDB oracle recomputes every
verdict from scratch).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lanterndb_spark.functions.text import (
    dup_ngram_fraction,
    quality_score,
    token_count,
)
from lanterndb_spark.operators.sampling import BUCKETS, hash_bucket

ROUND = 6


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    min_quality: float = 0.5,
    max_dup_bigram: float = 0.3,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Per-document curation verdict: ``id_col, kept, reason, split,
    n_tokens``.

    ``reason`` is the first failing rule of (too_short, low_quality,
    repetitive, duplicate) or 'kept'; ``split`` is the deterministic
    md5-bucket assignment for kept docs and '-' for dropped ones.
    Duplicate = not the lowest-``id_col`` holder of a normalized text
    hash (trim + whitespace-collapse + casefold).
    """
    splits = dict(splits or {"train": 0.8, "val": 0.1, "test": 0.1})
    txt = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(txt), r"\s+", " "))
    sig = docs.select(
        id_col,
        token_count(txt).alias("n_tokens"),
        F.round(quality_score(txt), ROUND).alias("__q"),
        F.round(dup_ngram_fraction(txt, 2), ROUND).alias("__rep"),
        F.xxhash64(norm).alias("__h1"),
        F.xxhash64(norm, F.lit(41)).alias("__h2"),
    )
    w = Window.partitionBy("__h1", "__h2").orderBy(id_col)
    tagged = sig.withColumn("__first", F.row_number().over(w) == 1)

    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("__q") < min_quality, F.lit("low_quality"))
        .when(F.col("__rep") > max_dup_bigram, F.lit("repetitive"))
        .when(~F.col("__first"), F.lit("duplicate"))
        .otherwise(F.lit("kept"))
    )
    b = hash_bucket(id_col, BUCKETS, salt)
    case = None
    acc = 0.0
    names = list(splits)
    for name in names:
        acc += splits[name]
        cond = b < int(round(acc * BUCKETS))
        case = F.when(cond, F.lit(name)) if case is None else case.when(cond, F.lit(name))
    split = case.otherwise(F.lit(names[-1]))

    return (
        tagged.withColumn("reason", reason)
        .select(
            id_col,
            (F.col("reason") == "kept").alias("kept"),
            "reason",
            F.when(F.col("reason") == "kept", split).otherwise(F.lit("-")).alias("split"),
            "n_tokens",
        )
    )
