"""Streaming distribution-drift monitor: PSI per micro-batch.

Production ingest wants the batch drift gate (``operators/profile.py
psi_drift``) evaluated continuously: fix a REFERENCE sample (e.g. the
training corpus), then score every arriving micro-batch against it and
alarm when the index crosses the standard thresholds (0.1 moderate,
0.25 drifted).

The reference's bucket layout is frozen ONCE (bounds from the reference
sample) so per-batch scores are comparable over time — recomputing
bounds per batch would silently re-normalize the very shift being
measured. Each batch costs one bins-bounded groupBy over the batch plus
a join against the cached reference counts: state is 2·bins doubles,
not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.operators.profile import psi_drift


class DriftMonitor:
    """Mutable handle: frozen reference + per-batch PSI readings."""

    def __init__(
        self,
        reference: DataFrame,
        value_col: str,
        bins: int = 10,
        threshold: float = 0.25,
    ):
        self.value_col, self.bins = value_col, int(bins)
        self.threshold = float(threshold)
        x = F.col(value_col).cast("double")
        row = (
            reference.filter(x.isNotNull())
            .agg(F.min(x).alias("lo"), F.max(x).alias("hi"))
            .first()
        )
        self.lo, self.hi = float(row["lo"]), float(row["hi"])
        # cache the reference: it is re-scanned once per batch otherwise
        self.reference = reference.persist()
        self.readings: list[dict] = []

    def writer(self):
        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            per_bucket = psi_drift(
                self.reference, batch_df, self.value_col,
                bins=self.bins, lo=self.lo, hi=self.hi,
            )
            psi = float(
                per_bucket.agg(F.sum("contrib").alias("psi")).first()["psi"]
            )
            self.readings.append(
                {"batch_id": int(batch_id), "psi": round(psi, 6),
                 "drifted": psi > self.threshold}
            )

        return write_batch

    def drifted_batches(self) -> list[int]:
        return [r["batch_id"] for r in self.readings if r["drifted"]]


def drift_monitor_stream(
    reference: DataFrame, value_col: str, bins: int = 10,
    threshold: float = 0.25,
) -> DriftMonitor:
    return DriftMonitor(reference, value_col, bins=bins, threshold=threshold)
