"""SQL-surface registration: make the engine's functions callable from
``spark.sql`` the way the reference's are callable from psql.

Reference users write ``SELECT ... ORDER BY v <-> ARRAY[...]`` or
``SELECT l2sq_dist(a, b)`` / ``text_to_stem_array(t)`` directly in SQL
(lantern.sql operator classes; stemmer_api.sql:121-137). The DataFrame
API here exposes those as Column expressions; this module registers the
same names for SQL users:

- distance functions are registered as Arrow-batched pandas UDFs
  (``l2sq_dist``, ``cos_dist``, ``hamming_dist``, ``inner_product``) —
  SQL functions must be invocable by name, which rules out pure column
  expressions, and vectorized numpy keeps the batch path fast. For
  hot-path DataFrame plans prefer ``functions.distance`` (whole-stage
  codegen); the SQL names trade a constant Arrow-transfer factor for SQL
  ergonomics, which is exactly how the reference's extension functions
  behave vs inlined operators.
- ``text_to_stem_array(text)`` runs tokenize+snowball+stopword-drop with
  the same engine defaults as the reference.

Usage::

    from lanterndb_spark.functions.sqlreg import register_sql_functions
    register_sql_functions(spark)
    spark.sql("SELECT l2sq_dist(embedding, array(1.0, ...)) FROM t")
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StringType


def _mat(s: pd.Series) -> np.ndarray:
    return np.asarray(s.tolist(), dtype=np.float64)


@F.pandas_udf(DoubleType())
def _l2sq(a: pd.Series, b: pd.Series) -> pd.Series:
    x, y = _mat(a), _mat(b)
    return pd.Series(((x - y) ** 2).sum(axis=1))


@F.pandas_udf(DoubleType())
def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
    x, y = _mat(a), _mat(b)
    nx = np.linalg.norm(x, axis=1)
    ny = np.linalg.norm(y, axis=1)
    denom = nx * ny
    with np.errstate(divide="ignore", invalid="ignore"):
        d = 1.0 - (x * y).sum(axis=1) / denom
    d[denom == 0] = np.nan  # NULL-safe zero-norm semantics as cos_dist()
    return pd.Series(d)


@F.pandas_udf(DoubleType())
def _inner(a: pd.Series, b: pd.Series) -> pd.Series:
    x, y = _mat(a), _mat(b)
    return pd.Series(-(x * y).sum(axis=1))  # <#> is NEGATIVE inner product


@F.pandas_udf(LongType())
def _hamming(a: pd.Series, b: pd.Series) -> pd.Series:
    # int32 elements, 32 bits each, sign-masked — hnsw.c:308-319 semantics
    x = np.asarray(a.tolist(), dtype=np.int64) & 0xFFFFFFFF
    y = np.asarray(b.tolist(), dtype=np.int64) & 0xFFFFFFFF
    xor = x ^ y
    total = np.zeros(len(xor), dtype=np.int64)
    while xor.any():  # ≤32 iterations (masked to 32 bits)
        total += (xor & 1).sum(axis=1)
        xor >>= 1
    return pd.Series(total)


@F.pandas_udf(ArrayType(StringType()))
def _stem_sql(s: pd.Series) -> pd.Series:
    from lanterndb_spark.functions.text import tokenize_py

    return s.map(lambda t: None if t is None else tokenize_py(t, stem=True))


@F.pandas_udf(ArrayType(StringType()))
def _stem_tsvector_sql(s: pd.Series) -> pd.Series:
    # the reference's second engine: text_to_stem_array(..., 'tsvector')
    # (lantern_extras/src/stemmer_api.sql:33-50) — Postgres-FTS profile
    from lanterndb_spark.functions.text import tokenize_tsvector_py

    return s.map(lambda t: None if t is None else tokenize_tsvector_py(t))


def register_sql_functions(spark: SparkSession) -> None:
    """Register the reference's SQL-callable functions on this session."""
    spark.udf.register("l2sq_dist", _l2sq)
    spark.udf.register("cos_dist", _cos)
    spark.udf.register("inner_product", _inner)
    spark.udf.register("hamming_dist", _hamming)
    spark.udf.register("text_to_stem_array", _stem_sql)
    spark.udf.register("text_to_stem_array_tsvector", _stem_tsvector_sql)
