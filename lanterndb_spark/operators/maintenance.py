"""Index/table maintenance — delete + incremental-insert semantics.

Reference analogues:
- ``ambulkdelete`` (lantern_hnsw/src/hnsw/delete.c:15-72): VACUUM walks
  the index and tombstones dead TIDs (label reset; memory NOT reclaimed).
  The scan then skips INVALID_ELEMENT_LABEL rows (scan.c:294-300).
- ``aminsert`` (insert.c:51-262): per-row graph append under WAL.

Spark recast: data is immutable Parquet, so both become set algebra —
queries run against ``base MINUS tombstones UNION deltas``. The ANN
artifacts (IVF assignments, SRP sketches, PQ codes) stay valid for
surviving rows because they are per-row columns, exactly like the
reference's index keeps serving around tombstoned labels until a
rebuild ("no memory reclaimed"). ``compact`` is the rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_tombstones(
    df: DataFrame, tombstones: DataFrame | list, id_col: str
) -> DataFrame:
    """Filter out deleted ids — the scan-time INVALID_ELEMENT_LABEL skip
    (scan.c:294-300). ``tombstones`` is a DataFrame with ``id_col`` or a
    plain id list. Anti-join broadcasts when small; at scale it's one
    shuffle on the id."""
    if isinstance(tombstones, list):
        if not tombstones:
            return df
        spark = df.sparkSession
        tombstones = spark.createDataFrame(
            [(t,) for t in tombstones], f"{id_col} {df.schema[id_col].dataType.simpleString()}"
        )
    return df.join(tombstones.select(id_col), on=id_col, how="left_anti")


def with_deltas(base: DataFrame, *deltas: DataFrame) -> DataFrame:
    """Append batches without rewriting the base (aminsert analogue):
    queries see base ∪ deltas. Missing columns in a delta (e.g. an ANN
    assignment not yet computed) become NULLs — re-run the assignment
    step on the delta before unioning to keep ANN exact."""
    out = base
    for d in deltas:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def compact(
    df: DataFrame,
    tombstones: DataFrame | list | None,
    id_col: str,
    *deltas: DataFrame,
) -> DataFrame:
    """The rebuild: fold tombstones + deltas into one clean DataFrame
    (write it back out to retire the tombstone set — the reference's
    REINDEX moment where deleted memory is finally reclaimed)."""
    out = with_deltas(df, *deltas)
    if tombstones is not None:
        out = apply_tombstones(out, tombstones, id_col)
    return out
