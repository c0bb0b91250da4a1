"""Size-targeted parquet sink: file geometry under control, values intact."""

import glob
import os

from pyspark.sql import functions as F

from lanterndb_spark.sources.sized import write_sized_parquet

SF_DIR = "/root/testdata/sf0.001"


def _files(path, pattern="**/*.parquet"):
    return [f for f in glob.glob(os.path.join(path, pattern), recursive=True)
            if not os.path.basename(f).startswith(("_", "."))]


def test_sized_write_splits_to_target(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_sized")
    # tiny target forces multiple files even at sf0.001
    info = write_sized_parquet(docs, out, target_mb=1, sample_rows=200)
    files = _files(out)
    assert len(files) == info["n_files"] >= 1
    got = spark.read.parquet(out)
    assert got.count() == info["rows"] == docs.count()
    a = {r["doc_id"] for r in got.select("doc_id").collect()}
    b = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert a == b


def test_sized_write_single_file_when_small(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_one")
    info = write_sized_parquet(docs, out, target_mb=512, sample_rows=200)
    assert info["n_files"] == 1
    assert len(_files(out)) == 1


def test_sized_write_partitioned_no_file_explosion(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "bucket", F.pmod("doc_id", F.lit(4))
    )
    out = str(tmp_path / "docs_part")
    write_sized_parquet(docs, out, target_mb=512, partition_by="bucket", sample_rows=200)
    # one file per partition dir at this size — not tasks x partitions
    for d in glob.glob(os.path.join(out, "bucket=*")):
        assert len(_files(d, "*.parquet")) == 1, d
    got = spark.read.parquet(out)
    assert got.count() == docs.count()
