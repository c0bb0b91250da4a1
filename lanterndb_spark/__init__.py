"""lanterndb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of lanterndata/lantern ("lanterndb").

The reference (read-only checkout at /root/reference) is a PostgreSQL vector
database stack: HNSW ANN indexing, product quantization, BM25 full-text
retrieval, weighted hybrid search and embedding pipelines. This package
re-expresses that capability surface Spark-first:

- distances are Catalyst column expressions (``functions.distance``), never
  Python UDFs, so they stay inside whole-stage codegen;
- top-k retrieval is ``orderBy(dist).limit(k)`` → ``TakeOrderedAndProject``
  (partition-local top-k + k-sized driver merge — the scale-safe plan);
- index structures (IVF centroids, PQ codebooks, BM25 postings, MinHash
  signatures) are DataFrames/Parquet tables, not opaque files;
- Python only runs where a model genuinely has to (k-means training on a
  bounded sample, PQ encode) and then as Arrow-batched pandas UDFs.

See SURVEY.md for the full capability map with reference citations.
"""

from lanterndb_spark.session import get_spark, load_tables
from lanterndb_spark.table import LanternTable

__all__ = ["get_spark", "load_tables", "LanternTable"]
__version__ = "0.1.0"
