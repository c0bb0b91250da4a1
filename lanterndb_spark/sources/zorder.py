"""Z-order (Morton-curve) multi-column data layout.

Single-column sort gives parquet min/max pruning on ONE predicate
dimension; a 100 TB table queried by both `user_id` AND time needs
multi-dimensional clustering. Interleaving the bits of the columns'
normalized ranks puts rows that are close in EVERY dimension into the
same files, so each file's min/max envelope covers a small box of the
space and a box query prunes most files at planning time (the same
technique lakehouse table formats expose as ``OPTIMIZE ZORDER BY``).

Pure Catalyst: the z-value is a sum of bitwise shift/mask terms over the
per-column ranks (stays in whole-stage codegen; no UDF), the layout is
``repartitionByRange(z).sortWithinPartitions(z)`` — one range shuffle,
the normal price of any clustered rewrite. Column ranges come from one
tiny min/max aggregate (driver-side scalars only).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType, TimestampNTZType


def _as_double(df: DataFrame, c: str) -> Column:
    t = df.schema[c].dataType
    if isinstance(t, (TimestampType, TimestampNTZType)):
        return F.unix_timestamp(F.col(c)).cast("double")
    return F.col(c).cast("double")


def zvalue(norms: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each pre-normalized rank column
    (values must already be longs in [0, 2^bits)): bit b of column i
    lands at position b*len(norms)+i of the z-value."""
    k = len(norms)
    z = F.lit(0).cast("long")
    for i, nc in enumerate(norms):
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(nc, b).bitwiseAND(F.lit(1)), b * k + i
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    files: int = 16,
) -> None:
    """Rewrite ``df`` under ``path`` clustered on the Z-curve of
    ``cols`` (2-3 columns; numeric or timestamp). ``files`` range
    partitions → that many output files, each covering a compact box of
    the value space (verifiable from parquet footer min/max stats)."""
    if not 2 <= len(cols) <= 3:
        raise ValueError("zorder_write clusters on 2 or 3 columns")
    lohi = df.agg(
        *[F.min(_as_double(df, c)).alias(f"{c}__lo") for c in cols],
        *[F.max(_as_double(df, c)).alias(f"{c}__hi") for c in cols],
    ).first()
    top = (1 << bits) - 1
    norms = []
    for c in cols:
        lo, hi = lohi[f"{c}__lo"], lohi[f"{c}__hi"]
        span = (hi - lo) or 1.0
        norms.append(
            F.least(
                F.lit(top).cast("long"),
                F.floor((_as_double(df, c) - F.lit(lo)) / F.lit(span) * top).cast("long"),
            )
        )
    z = df.withColumn("__z", zvalue(norms, bits))
    (
        z.repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_boxes(path: str, cols: list[str]) -> list[dict]:
    """Per-parquet-file min/max envelope of ``cols`` from the footers —
    the statistics the scan planner prunes with. Driver-side metadata
    only (no data read)."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        box = {"file": f}
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            box[c] = (lo, hi)
        out.append(box)
    return out
