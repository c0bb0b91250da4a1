"""The full curation pipeline — raw corpus to packed training sequences
in ONE composed pass.

This is the end-to-end story the individual operators exist for:

    quality signals -> PII gate -> benchmark decontamination ->
    exact dedup -> train/val/test split -> sequence packing

Every stage is one of this engine's oracle-checked primitives
(functions/text.py, functions/pii.py, operators/contamination.py,
operators/curate.py, operators/sampling.py, operators/packing.py);
this module wires them into a single DataFrame so the whole corpus is
curated in a bounded number of shuffles:

1. signal computation — pure projection (rides the scan);
2. contamination hits — broadcast eval-gram join, only matching rows
   shuffle (contamination.py's argument);
3. duplicate tagging — one window on the 128-bit content hash;
4. split — projection (md5 buckets);
5. packing — one window on the pack bucket, cumulative token sum over
   KEPT docs only (dropped docs don't advance the stream).

Total: two windows + one broadcast-join groupBy for a 6-stage pipeline.
Per-document verdicts carry the FIRST failing rule, so corpus loss is
attributable, and every number is recomputed from scratch by the DuckDB
oracle (driver query ``pipeline_full``).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lanterndb_spark.functions.pii import pii_flag
from lanterndb_spark.functions.text import (
    dup_ngram_fraction,
    quality_score,
    token_count,
)
from lanterndb_spark.operators.contamination import decontaminate
from lanterndb_spark.operators.sampling import BUCKETS, hash_bucket

ROUND = 6


def curation_pipeline(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    min_quality: float = 0.5,
    max_dup_bigram: float = 0.3,
    decontam_n: int = 5,
    splits: Mapping[str, float] | None = None,
    salt: str = "",
    pack_budget: int = 128,
    pack_buckets: int = 8,
) -> DataFrame:
    """Per-document pipeline verdict:
    ``id_col, kept, reason, split, n_tokens, bucket, seq, offset``.

    ``reason`` is the first failing rule of (too_short, low_quality,
    repetitive, pii, contaminated, duplicate) or 'kept'. ``split`` is
    the md5-bucket assignment ('-' when dropped). ``seq``/``offset``
    place each KEPT doc in its contiguous packed sequence (NULL when
    dropped) — dropped docs do not advance the token stream.
    """
    splits = dict(splits or {"train": 0.8, "val": 0.1, "test": 0.1})
    txt = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(txt), r"\s+", " "))
    sig = docs.select(
        id_col,
        token_count(txt).alias("n_tokens"),
        F.round(quality_score(txt), ROUND).alias("__q"),
        F.round(dup_ngram_fraction(txt, 2), ROUND).alias("__rep"),
        pii_flag(txt).alias("__pii"),
        F.xxhash64(norm).alias("__h1"),
        F.xxhash64(norm, F.lit(41)).alias("__h2"),
    )
    if eval_df is not None:
        hits = decontaminate(
            docs, eval_df, n=decontam_n, id_col=id_col, text_col=text_col
        ).select(id_col, "contaminated")
        sig = sig.join(hits, id_col, "left").withColumn(
            "__cont", F.coalesce("contaminated", F.lit(False))
        ).drop("contaminated")
    else:
        sig = sig.withColumn("__cont", F.lit(False))

    wdup = Window.partitionBy("__h1", "__h2").orderBy(id_col)
    tagged = sig.withColumn("__first", F.row_number().over(wdup) == 1)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("__q") < min_quality, F.lit("low_quality"))
        .when(F.col("__rep") > max_dup_bigram, F.lit("repetitive"))
        .when(F.col("__pii"), F.lit("pii"))
        .when(F.col("__cont"), F.lit("contaminated"))
        .when(~F.col("__first"), F.lit("duplicate"))
        .otherwise(F.lit("kept"))
    )
    tagged = tagged.withColumn("reason", reason).withColumn(
        "kept", F.col("reason") == "kept"
    )

    b = hash_bucket(id_col, BUCKETS, salt)
    case, acc = None, 0.0
    names = list(splits)
    for name in names:
        acc += splits[name]
        cond = b < int(round(acc * BUCKETS))
        case = F.when(cond, F.lit(name)) if case is None else case.when(cond, F.lit(name))
    split = case.otherwise(F.lit(names[-1]))

    pb = (hash_bucket(id_col, salt=salt) % F.lit(int(pack_buckets))).cast("int")
    tagged = tagged.withColumn("bucket", pb)
    wpack = Window.partitionBy("bucket").orderBy(id_col)
    kept_tokens = F.when(F.col("kept"), F.col("n_tokens").cast("bigint")).otherwise(
        F.lit(0).cast("bigint")
    )
    start = F.sum(kept_tokens).over(wpack) - kept_tokens
    return tagged.select(
        id_col,
        "kept",
        "reason",
        F.when(F.col("kept"), split).otherwise(F.lit("-")).alias("split"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "bucket",
        F.when(F.col("kept"), F.floor(start / int(pack_budget)).cast("int")).alias("seq"),
        F.when(F.col("kept"), (start % int(pack_budget)).cast("int")).alias("offset"),
    )
