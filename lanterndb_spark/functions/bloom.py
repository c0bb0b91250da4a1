"""Bloom-filter helpers — the ``bloom`` type of the reference
(lantern_extras/src/bloom.rs:9-14: ``{bitmap: Vec<u8>, num_hashes}``,
casts from int/text arrays :76-91, ``elem_in_bloom`` membership :46-103).

The reference uses blooms to approximate giant BM25 posting lists
(bm25_agg.rs:162-188). Spark's own BloomFilterImpl aggregate
(``bloom_filter_agg``) is optimizer-internal and not in the function
registry, so the bitmap is built with plain DataFrame ops instead —
which keeps it a first-class, self-describing column value exactly like
the reference's type: ``struct<nh: int, bits: array<bigint>>``.

- build: per element, k bit positions by Kirsch-Mitzenmacher double
  hashing (xxhash64 + murmur3) → explode → ``bit_or`` into 64-bit words
  grouped by (key, word index) → assemble the bitmap. One shuffle, all
  codegen'd aggregates.
- probe: k single-bit tests on the bitmap — a pure column expression
  usable in any filter/join; geometry (bit count, hash count) read from
  the struct itself, so build and probe can never disagree.

Exact postings aggregation is already shuffle-parallel here, so blooms
are an *optional* bandwidth optimization (ship a kilobyte bitmap instead
of a million-element doc_ids array to the probe side), not a correctness
crutch like the reference's UDAF-state bound.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 4


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def optimal_bits(expected_items: int, fpp: float = 0.03) -> int:
    """Standard sizing m = -n·ln(p)/ln(2)², rounded up to whole words."""
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    return ((m + 63) // 64) * 64


def _hashes(elem) -> tuple[Column, Column]:
    """(h1, h2) for Kirsch-Mitzenmacher h_i = h1 + i·h2 — two hash
    evaluations regardless of the hash count; h2 forced odd."""
    e = _c(elem)
    return F.xxhash64(e), F.hash(e).cast("bigint").bitwiseOR(F.lit(1).cast("bigint"))


def bloom_build(
    df: DataFrame,
    elem_col: str,
    key_cols: list[str],
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    out_col: str = "bloom",
) -> DataFrame:
    """One bloom per distinct ``key_cols`` group over that group's
    ``elem_col`` values. Returns (key_cols…, out_col struct<nh, bits>)."""
    num_bits = ((num_bits + 63) // 64) * 64
    words = num_bits // 64
    h1, h2 = _hashes(F.col(elem_col))
    pos = F.array(
        *[F.pmod(h1 + F.lit(i).cast("bigint") * h2, F.lit(num_bits)) for i in range(num_hashes)]
    )
    ex = df.select(*key_cols, F.explode(pos).alias("__p"))
    per_word = ex.select(
        *key_cols,
        (F.col("__p") / 64).cast("int").alias("__w"),
        F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (F.col("__p") % 64).cast("int")
        ).alias("__bit"),
    ).groupBy(*key_cols, "__w").agg(F.bit_or("__bit").alias("__word"))
    assembled = per_word.groupBy(*key_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("__w", "__word"))).alias("__m")
    )
    bitmap = F.transform(
        F.sequence(F.lit(0), F.lit(words - 1)),
        lambda w: F.coalesce(
            F.element_at(F.col("__m"), w.cast("int")), F.lit(0).cast("bigint")
        ),
    )
    bloom = F.struct(F.lit(num_hashes).alias("nh"), bitmap.alias("bits"))
    return assembled.select(*key_cols, bloom.alias(out_col))


def might_contain(bloom_col, elem) -> Column:
    """Membership test (``elem_in_bloom`` analogue). False positives at
    the configured rate; never false negatives. NULL bloom → NULL (treat
    with coalesce at the call site). Pure column expression."""
    from lanterndb_spark.functions.text import expr_let

    b = _c(bloom_col)
    h1, h2 = _hashes(elem)
    nbits = (F.size(b["bits"]) * 64).cast("bigint")

    def probe(hs):
        # hs = [h1, h2] bound once (expr_let): the md5-derived hashes are
        # computed per TEST, not per PROBE — the forall lambda below only
        # reads bound variables
        def bit_set(i):
            p = F.pmod(hs[0] + i.cast("bigint") * hs[1], nbits)
            word = F.element_at(b["bits"], (p / 64).cast("int") + 1)
            return word.bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), (p % 64).cast("int")
                )
            ) != 0

        return F.forall(F.sequence(F.lit(0), b["nh"] - 1), bit_set)

    return expr_let(F.array(h1, h2), probe)


def array_to_bloom(
    df: DataFrame,
    arr_col: str,
    key_cols: list[str],
    num_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    out_col: str = "bloom",
) -> DataFrame:
    """Per-row bloom of an array column's elements — the
    ``array_to_bloom(int[]/text[]) -> bloom`` cast (bloom.rs:76-91):
    explode + bloom_build + join back."""
    ex = df.select(*key_cols, F.explode(arr_col).alias("__e"))
    blooms = bloom_build(ex, "__e", key_cols, num_bits, num_hashes, out_col)
    return df.join(blooms, on=key_cols, how="left")


def add_posting_blooms(
    postings: DataFrame,
    threshold: int = 8000,
    fpp: float = 0.03,
    num_bits: int | None = None,
) -> DataFrame:
    """Attach ``doc_ids_bloom`` to postings rows with more than
    ``threshold`` docs — the hot-term approximation knob
    (GUC bm25_default_approximation_threshhold, lib.rs:46; bloom column
    created in bm25_api.sql:31-56). Cold terms keep a NULL bloom."""
    num_bits = num_bits or optimal_bits(threshold * 4, fpp)
    hot = postings.filter(F.col("doc_ids_len") > threshold).select("term", "doc_ids")
    with_bloom = array_to_bloom(
        hot, "doc_ids", ["term"], num_bits, out_col="doc_ids_bloom"
    ).select("term", "doc_ids_bloom")
    return postings.join(with_bloom, on="term", how="left")
