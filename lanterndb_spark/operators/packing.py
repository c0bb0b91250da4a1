"""Sequence packing — assemble documents into fixed token-budget
training sequences.

LLM pretraining consumes fixed-length sequences (2k/4k/8k tokens), not
documents; the packer decides which docs share a sequence. Two
strategies, both deterministic and partition-layout independent:

- ``pack_contiguous`` (the GPT-style default): docs are laid end-to-end
  in a deterministic order and the stream is cut every ``budget``
  tokens; a doc may span a cut. Pure window arithmetic — cumulative sum
  over a hash-bucketed partition — so the WHOLE corpus packs in one
  shuffle and every bucket packs in parallel. The deterministic order
  is (md5-bucket(id), id), so re-running on a reshuffled copy gives
  byte-identical packing (same argument as operators/sampling.py).
- ``pack_first_fit``: greedy first-fit WITHOUT splitting docs (for
  SFT-style packing where a doc must stay whole). Inherently
  sequential per bucket -> applyInPandas over the same hash buckets:
  each bucket's greedy scan runs as one Arrow batch, buckets in
  parallel. Oversized docs (> budget) get a bin of their own.

At 100 TB the bucket count is the parallelism knob: 2**14 buckets of
~6 GB each keep every window/pandas group executor-sized regardless of
total corpus size.

The reference has no packing surface; this is part of the
training-pipeline extension set (README "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lanterndb_spark.functions.text import token_count
from lanterndb_spark.operators.sampling import hash_bucket


def pack_contiguous(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Contiguous packing: ``id_col, n_tokens, bucket, seq, offset,
    spans_boundary``.

    ``seq`` is the sequence index within the bucket where the doc
    STARTS, ``offset`` the token offset inside that sequence, and
    ``spans_boundary`` whether the doc crosses a sequence cut (its tail
    continues in ``seq+1...``). Global sequence id, if needed, is
    ``bucket * max_seq + seq`` — kept factored so the oracle stays
    integer-exact.
    """
    budget = int(budget)
    toks = token_count(F.col(text_col)).cast("bigint")
    b = (hash_bucket(id_col, salt=salt) % F.lit(int(n_buckets))).cast("int")
    base = docs.select(
        F.col(id_col), toks.alias("n_tokens"), b.alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "bucket",
        F.floor(start / budget).cast("int").alias("seq"),
        (start % budget).cast("int").alias("offset"),
        ((start % budget) + F.col("n_tokens") > budget).alias("spans_boundary"),
    )


def pack_first_fit(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Greedy first-fit packing (docs stay whole): ``id_col, n_tokens,
    bucket, bin``. Within each bucket docs are scanned in ``id_col``
    order and placed in the first open bin with room; a doc larger than
    ``budget`` occupies a bin alone. Invariant (asserted in tests):
    every bin's token sum <= budget unless it holds a single oversized
    doc."""
    import pandas as pd

    budget = int(budget)
    toks = token_count(F.col(text_col)).cast("int")
    b = (hash_bucket(id_col, salt=salt) % F.lit(int(n_buckets))).cast("int")
    base = docs.select(F.col(id_col), toks.alias("n_tokens"), b.alias("bucket"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        loads: list[int] = []  # current token load per open bin
        bins: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for i, load in enumerate(loads):
                if load + n <= budget:
                    loads[i] = load + n
                    bins.append(i)
                    break
            else:
                loads.append(n)
                bins.append(len(loads) - 1)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        return pdf

    id_type = base.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens int, bucket int, bin int"
    return base.groupBy("bucket").applyInPandas(fit, schema)
