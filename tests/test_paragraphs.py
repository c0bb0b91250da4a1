"""Paragraph-level dedup: semantics + plan shape.

Semantics pinned: first occurrence (lowest doc_id, para_idx) survives,
later copies drop; normalization (case/whitespace) folds into one
identity; reassembly preserves in-doc order; every distinct paragraph
survives exactly once corpus-wide.
"""

from pyspark.sql import functions as F

from lanterndb_spark.operators.paragraphs import (
    remove_duplicate_paragraphs,
    split_paragraphs,
    tag_duplicate_paragraphs,
)


def _corpus(spark):
    rows = [
        (1, "alpha beta\n\nshared paragraph here\n\ngamma"),
        (2, "SHARED   paragraph HERE\n\ndelta epsilon"),  # dup of doc1 para after norm
        (3, "shared paragraph here"),                      # dup again, whole doc
        (4, "unique closing thoughts"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins(spark):
    tagged = tag_duplicate_paragraphs(split_paragraphs(_corpus(spark)))
    kept = {
        (r["doc_id"], r["para_idx"]): r["is_kept"] for r in tagged.collect()
    }
    assert kept[(1, 1)] is True    # first copy of the shared paragraph
    assert kept[(2, 0)] is False   # normalized dup
    assert kept[(3, 0)] is False
    assert kept[(4, 0)] is True


def test_reassembly_order_and_counts(spark):
    out = {r["doc_id"]: r for r in remove_duplicate_paragraphs(_corpus(spark)).collect()}
    assert out[1]["clean_text"] == "alpha beta\n\nshared paragraph here\n\ngamma"
    assert out[2]["clean_text"] == "delta epsilon"
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == "unique closing thoughts"


def test_every_paragraph_survives_once(spark):
    tagged = tag_duplicate_paragraphs(split_paragraphs(_corpus(spark)))
    per_norm = (
        tagged.groupBy(F.trim(F.regexp_replace(F.lower("para"), r"\s+", " ")).alias("n"))
        .agg(F.sum(F.col("is_kept").cast("int")).alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_norm)


def test_token_chunk_mode_covers_text(spark, tables):
    docs = tables["documents"].limit(50)
    paras = split_paragraphs(docs, chunk_tokens=16)
    # chunks reassemble to the original token stream
    back = (
        paras.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("t")
        )
    )
    joined = back.join(docs.select("doc_id", "text"), "doc_id")
    assert joined.filter(F.col("t") != F.col("text")).count() == 0


def test_dedup_shuffles_on_hash_not_global_sort(spark):
    """The window must partition by the content hash — a global sort or
    single-partition window would serialize the corpus through one task."""
    plan = (
        tag_duplicate_paragraphs(split_paragraphs(_corpus(spark)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(__h1" in plan
    assert "SinglePartition" not in plan


def test_chunk_documents_boundaries(spark):
    from lanterndb_spark.operators.paragraphs import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))),
         (2, "a b c"),
         (3, ""),
         (4, " ".join(f"u{i}" for i in range(51)))],
        "doc_id int, text string",
    )
    out = chunk_documents(docs, max_tokens=50, overlap=10)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 100 tokens, stride 40 -> chunks at 0,40,80 of sizes 50,50,20
    assert {(cid) for (d, cid) in rows if d == 1} == {0, 1, 2}
    assert rows[(1, 0)]["n_tokens"] == 50 and rows[(1, 2)]["n_tokens"] == 20
    assert rows[(1, 1)]["chunk_text"].split()[0] == "t40"  # overlap carried
    assert rows[(1, 0)]["chunk_text"].split()[-10:] == rows[(1, 1)]["chunk_text"].split()[:10]
    # doc 2 fits one chunk; doc 3 yields none; doc 4: 51 tokens -> 2 chunks
    assert rows[(2, 0)]["n_tokens"] == 3
    assert not any(d == 3 for (d, _c) in rows)
    assert {(cid) for (d, cid) in rows if d == 4} == {0, 1}
    assert rows[(4, 1)]["n_tokens"] == 11  # tokens 40..50


def test_chunk_documents_validates_overlap(spark):
    import pytest

    from lanterndb_spark.operators.paragraphs import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, max_tokens=10, overlap=10)
