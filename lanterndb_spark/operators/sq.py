"""Scalar quantization — the ``quant_bits`` reloption (f32/f16/i8/b1)
of the reference (lantern_hnsw/src/hnsw/options.c:137-158 maps 32→f32,
16→f16, 8→i8, 1→b1; exercised by test/sql/hnsw_sq.sql).

The reference quantizes inside usearch storage; here quantization is a
column transform (storage IS columns). All of i8/b1 are pure Catalyst
expressions — codegen'd, no Python in the row path; f16 is a numpy
round-trip UDF (Spark has no half type).

- i8: symmetric per-vector scale s = max|x|/127, code = round(x/s) —
  4× smaller, distances on dequantized values approximate the original.
- b1: sign bits packed 32-per-int32 (the bit layout hamming_dist expects,
  hnsw.c:308-319) — 32× smaller, hamming approximates angle.
- f16: IEEE half round-trip (value simulation; parquet still stores f32).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

I8_MAX = 127.0


def sq8_quantize(df: DataFrame, vec_col: str, code_col: str | None = None) -> DataFrame:
    """Add ``<col>_sq8`` (array<tinyint>) + ``<col>_sq8_scale`` (float)."""
    code_col = code_col or f"{vec_col}_sq8"
    v = F.col(vec_col)
    scale = (
        F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30))
        / F.lit(I8_MAX)
    ).cast("double")
    out = df.withColumn(f"{code_col}_scale", scale)
    sc = F.col(f"{code_col}_scale")
    return out.withColumn(
        code_col,
        F.transform(v, lambda x: F.round(x.cast("double") / sc).cast("tinyint")),
    )


def sq8_dequantize(df: DataFrame, code_col: str, out_col: str) -> DataFrame:
    """codes · scale → array<double> (lossy inverse)."""
    sc = F.col(f"{code_col}_scale")
    return df.withColumn(
        out_col, F.transform(F.col(code_col), lambda c: c.cast("double") * sc)
    )


def sq8_l2sq(code_a, scale_a, code_b, scale_b) -> Column:
    """Squared L2 between two sq8 vectors without materializing floats:
    Σ (a·sa − b·sb)² — one codegen'd fold."""
    a = F.col(code_a) if isinstance(code_a, str) else code_a
    b = F.col(code_b) if isinstance(code_b, str) else code_b
    sa = F.col(scale_a) if isinstance(scale_a, str) else scale_a
    sb = F.col(scale_b) if isinstance(scale_b, str) else scale_b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") * sa - y.cast("double") * sb) ** 2),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _bit_literal(i: int) -> int:
    """Signed-int32 literal with bit ``i`` set (bit 31 = INT_MIN)."""
    return (1 << i) if i < 31 else -(1 << 31)


def b1_quantize(df: DataFrame, vec_col: str, dim: int, code_col: str | None = None) -> DataFrame:
    """Sign bits packed 32-per-int — ``array<int>`` compatible with
    functions.distance.hamming_dist (int32 elements contribute 32 bits,
    hnsw.c:308-319). dim must be known (Spark arrays are unsized)."""
    code_col = code_col or f"{vec_col}_b1"
    v = F.col(vec_col)
    words = []
    for w in range((dim + 31) // 32):
        bits = [
            F.when(v[w * 32 + i] > 0, F.lit(_bit_literal(i))).otherwise(F.lit(0))
            for i in range(min(32, dim - w * 32))
        ]
        # bits are disjoint → sum == bitwise-or, and sum folds in codegen
        words.append(reduce(lambda a, b: a + b, bits).cast("int"))
    return df.withColumn(code_col, F.array(*words))


def f16_quantize(df: DataFrame, vec_col: str, out_col: str | None = None) -> DataFrame:
    """IEEE-754 half-precision value simulation (round to nearest-even),
    matching what usearch stores for quant_bits=16."""
    out_col = out_col or f"{vec_col}_f16"

    @F.pandas_udf("array<float>")
    def to_f16(s: pd.Series) -> pd.Series:
        return s.map(lambda v: np.asarray(v, dtype=np.float16).astype(np.float32).tolist())

    return df.withColumn(out_col, to_f16(F.col(vec_col)))
