import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lanterndb_spark.functions.bloom import (
    add_posting_blooms,
    bloom_build,
    might_contain,
    optimal_bits,
)
from lanterndb_spark.functions.distance import hamming_dist, l2sq_dist
from lanterndb_spark.operators.bm25 import bm25_score, build_postings, corpus_stats
from lanterndb_spark.operators.knn import knn
from lanterndb_spark.operators.lsh import build_srp, srp_search, srp_search_batch
from lanterndb_spark.operators.sq import (
    b1_quantize,
    f16_quantize,
    sq8_dequantize,
    sq8_l2sq,
    sq8_quantize,
)


# ----------------------------------------------------------------- bloom

def test_bloom_membership_and_fpp(spark):
    nbits = optimal_bits(1000, 0.01)
    df = spark.range(0, 1000).withColumn("g", F.lit(1))
    bloom = bloom_build(df, "id", ["g"], num_bits=nbits)
    joined = spark.range(0, 2000).crossJoin(bloom.select("bloom"))
    res = joined.select("id", might_contain("bloom", "id").alias("hit")).collect()
    hits = {r["id"]: r["hit"] for r in res}
    assert all(hits[i] for i in range(1000))  # no false negatives
    fp = sum(hits[i] for i in range(1000, 2000))
    assert fp < 100  # fp rate well under 10% at a 1% target


def test_array_to_bloom_and_posting_blooms(tables):
    docs = tables["documents"]
    postings = build_postings(docs).cache()
    # low threshold so some terms get blooms at sf0.001
    with_blooms = add_posting_blooms(postings, threshold=5)
    hot = with_blooms.filter(F.col("doc_ids_bloom").isNotNull())
    assert hot.count() == postings.filter(F.col("doc_ids_len") > 5).count()
    # membership holds for every doc in a hot term's postings
    row = hot.first()
    checks = (
        hot.filter(F.col("term") == row["term"])
        .select(F.explode("doc_ids").alias("d"), "doc_ids_bloom")
        .select(might_contain("doc_ids_bloom", "d").alias("hit"))
        .collect()
    )
    assert all(r["hit"] for r in checks)


# ------------------------------------------------------------- bm25_score

def test_bm25_score_ad_hoc_doc(tables):
    docs = tables["documents"]
    postings = build_postings(docs).cache()
    stats = corpus_stats(docs)
    s = bm25_score(postings, stats, "spark window merge spark", "spark merge")
    assert s > 0
    # absent query terms → 0
    assert bm25_score(postings, stats, "spark window", "zzzqqq") == 0.0
    # score increases with term frequency in the doc
    s2 = bm25_score(postings, stats, "spark spark spark window", "spark")
    s1 = bm25_score(postings, stats, "spark window window window", "spark")
    assert s2 > s1


# -------------------------------------------------------------------- sq

def test_sq8_roundtrip_and_distance(tables):
    emb = tables["embeddings"].limit(50)
    q = sq8_quantize(emb, "embedding")
    d = sq8_dequantize(q, "embedding_sq8", "deq")
    err = d.select(
        F.sqrt(l2sq_dist("embedding", "deq")).alias("e"),
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x),
                F.lit(0.0), lambda a, b: a + b,
            )
        ).alias("n"),
    ).collect()
    # relative reconstruction error small (i8 symmetric ~ <1%)
    for r in err:
        assert r["e"] <= 0.02 * max(r["n"], 1e-9)


def test_sq8_l2sq_matches_dequantized(tables):
    emb = tables["embeddings"].limit(20)
    a = sq8_quantize(emb, "embedding").select(
        F.col("vec_id").alias("ida"), F.col("embedding_sq8").alias("ca"),
        F.col("embedding_sq8_scale").alias("sa"),
    )
    b = sq8_quantize(emb, "embedding").select(
        F.col("vec_id").alias("idb"), F.col("embedding_sq8").alias("cb"),
        F.col("embedding_sq8_scale").alias("sb"),
    )
    pair = a.crossJoin(b).filter(F.col("ida") < F.col("idb")).limit(30)
    rows = pair.select(
        sq8_l2sq("ca", "sa", "cb", "sb").alias("dq"),
        F.aggregate(
            F.zip_with(
                F.transform("ca", lambda c: c.cast("double") * F.col("sa")),
                F.transform("cb", lambda c: c.cast("double") * F.col("sb")),
                lambda x, y: (x - y) ** 2,
            ),
            F.lit(0.0), lambda acc, v: acc + v,
        ).alias("ref"),
    ).collect()
    for r in rows:
        assert r["dq"] == pytest.approx(r["ref"], rel=1e-9)


def test_b1_quantize_bits(spark):
    df = spark.createDataFrame(
        [([1.0, -1.0, 2.0, 0.0] * 16,)], "v array<float>"
    )
    out = b1_quantize(df, "v", dim=64).first()["v_b1"]
    assert len(out) == 2
    # pattern 1011 repeated → per 32-bit word: bits {0,2,3}? no: >0 at idx 0,2
    # idx%4==0 or idx%4==2 → bits 0b0101... check via popcount
    total = sum(bin(w & 0xFFFFFFFF).count("1") for w in out)
    assert total == 32  # half the 64 dims are positive


def test_b1_hamming_knn(tables):
    emb = tables["embeddings"].limit(200)
    dim = len(emb.first()["embedding"])
    b = b1_quantize(emb, "embedding", dim=dim)
    q = b.filter(F.col("vec_id") == 0).first()["embedding_b1"]
    rows = knn(b, "embedding_b1", [int(x) for x in q], k=5, metric="hamming", id_col="vec_id").collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["dist"] == 0


def test_f16_quantize(tables):
    emb = tables["embeddings"].limit(10)
    out = f16_quantize(emb, "embedding").select("embedding", "embedding_f16").first()
    got = np.array(out["embedding_f16"], dtype=np.float32)
    want = np.asarray(out["embedding"], dtype=np.float16).astype(np.float32)
    assert np.array_equal(got, want)


# ------------------------------------------------------------------- srp

def test_srp_full_recall_at_high_oversample(tables):
    emb = tables["embeddings"]
    idx = build_srp(emb, "embedding", nbits=128, seed=1)
    idx.sketched.cache().count()
    q = [float(x) for x in emb.filter(F.col("vec_id") == 5).first()["embedding"]]
    exact = [r["vec_id"] for r in knn(emb, "embedding", q, k=10, metric="cos", id_col="vec_id").collect()]
    # oversample big enough to cover the whole table → recall 1
    n = emb.count()
    got = [r["vec_id"] for r in srp_search(idx, q, k=10, oversample=(n // 10) + 1, id_col="vec_id").collect()]
    assert got == exact


def test_srp_partial_recall_reasonable(tables):
    from lanterndb_spark.operators.autotune import recall_at_k

    emb = tables["embeddings"]
    idx = build_srp(emb, "embedding", nbits=256, seed=1)
    idx.sketched.cache().count()
    qs = [[float(x) for x in r["embedding"]] for r in emb.limit(5).collect()]
    res = srp_search_batch(idx, qs, k=10, oversample=20, id_col="vec_id").collect()
    by_q = {}
    for r in sorted(res, key=lambda r: (r["q_id"], r["dist"], r["vec_id"])):
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    recs = []
    for qi, q in enumerate(qs):
        exact = [r["vec_id"] for r in knn(emb, "embedding", q, k=10, metric="cos", id_col="vec_id").collect()]
        recs.append(recall_at_k(by_q.get(qi, []), exact))
    assert sum(recs) / len(recs) >= 0.5  # sketch is coarse but far above random


def test_srp_batch_matches_single(tables):
    emb = tables["embeddings"]
    idx = build_srp(emb, "embedding", nbits=128, seed=1)
    idx.sketched.cache().count()
    qs = [[float(x) for x in r["embedding"]] for r in emb.limit(2).collect()]
    batch = srp_search_batch(idx, qs, k=5, oversample=10, id_col="vec_id").collect()
    by_q = {}
    for r in sorted(batch, key=lambda r: (r["q_id"], r["dist"], r["vec_id"])):
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    for qi, q in enumerate(qs):
        single = [r["vec_id"] for r in srp_search(idx, q, k=5, oversample=10, id_col="vec_id").collect()]
        assert by_q[qi] == single


def test_masked_explain(tables):
    from lanterndb_spark.plans.explain import mask_arrays, masked_explain

    emb = tables["embeddings"]
    q = [float(i) for i in range(16)]
    df = knn(emb, "embedding", q, k=3)
    s = masked_explain(df, mode="simple")
    assert "…×" in s or "[0.0, 1.0, 2.0" not in s  # long literal collapsed
    masked = mask_arrays("[" + ", ".join(str(float(i)) for i in range(50)) + "]")
    assert "…×50" in masked


def test_srp_save_load_roundtrip(tables, spark, tmp_path):
    from lanterndb_spark.operators.lsh import build_srp, load_srp, srp_search

    emb = tables["embeddings"]
    idx = build_srp(emb, "embedding", nbits=128, seed=3)
    from lanterndb_spark.operators.lsh import save_srp

    save_srp(idx, str(tmp_path / "srp"))
    loaded = load_srp(spark, str(tmp_path / "srp"), "embedding")
    q = [float(x) for x in emb.first()["embedding"]]
    a = [r["vec_id"] for r in srp_search(idx, q, k=5, oversample=10, id_col="vec_id").collect()]
    b = [r["vec_id"] for r in srp_search(loaded, q, k=5, oversample=10, id_col="vec_id").collect()]
    assert a == b


def test_srp_filtered_search_matches_exact_filtered(tables):
    """pred composes with the index scan (filtered ANN,
    hnsw_select.sql:50-51): at full oversample the filtered SRP search
    must equal exact filtered knn, and every hit satisfies the filter."""
    from lanterndb_spark.operators.knn import knn

    emb = tables["embeddings"]
    n = emb.count()
    idx = build_srp(emb, "embedding", nbits=64, seed=42)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    pred = F.col("label") == 3
    got = srp_search(
        idx, q, k=5, oversample=(n // 5) + 1, id_col="vec_id", pred=pred
    ).collect()
    assert all(r["label"] == 3 for r in got)
    exact = knn(
        emb.filter(pred), "embedding", q, k=5, metric="cos", id_col="vec_id"
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_srp_batch_filtered_matches_exact(tables):
    from lanterndb_spark.operators.knn import knn

    emb = tables["embeddings"]
    n = emb.count()
    idx = build_srp(emb, "embedding", nbits=64, seed=42)
    qs = [[float(x) for x in r["embedding"]]
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    pred = F.col("label") == 3
    got = srp_search_batch(
        idx, qs, k=5, oversample=(n // 5) + 1, id_col="vec_id", pred=pred
    ).collect()
    assert got and all(r["label"] == 3 for r in got)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["dist"], r["vec_id"])):
        by_q.setdefault(r["q_id"], []).append(r["vec_id"])
    for qi, q in enumerate(qs):
        exact = [r["vec_id"] for r in
                 knn(emb.filter(pred), "embedding", q, k=5, metric="cos",
                     id_col="vec_id").collect()]
        assert by_q[qi] == exact
