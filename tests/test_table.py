import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.knn import knn
from lanterndb_spark.table import LanternTable


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"]


def qvec(emb, i):
    return [float(x) for x in emb.filter(F.col("vec_id") == i).first()["embedding"]]


def test_auto_routing_exact_when_no_index(emb):
    t = LanternTable(emb, "vec_id")
    q = qvec(emb, 0)
    got = [r["vec_id"] for r in t.knn("embedding", q, k=5).collect()]
    want = [r["vec_id"] for r in knn(emb, "embedding", q, k=5, id_col="vec_id").collect()]
    assert got == want


def test_auto_routing_uses_index_and_exact_override(emb):
    t = LanternTable(emb, "vec_id").create_index("embedding", kind="ivf", nlist=4, seed=42)
    q = qvec(emb, 3)
    # nprobe=nlist → index path degrades to exact: same results
    via_index = [r["vec_id"] for r in t.knn("embedding", q, k=5, nprobe=4).collect()]
    exact = [r["vec_id"] for r in t.knn("embedding", q, k=5, mode="exact").collect()]
    assert via_index == exact


def test_delete_insert_visibility_through_index(emb):
    t = LanternTable(emb, "vec_id").create_index("embedding", kind="ivf", nlist=4, seed=42)
    q = qvec(emb, 0)
    top = t.knn("embedding", q, k=3, nprobe=4).collect()
    assert top[0]["vec_id"] == 0
    t.delete([0])
    top2 = t.knn("embedding", q, k=3, nprobe=4).collect()
    assert all(r["vec_id"] != 0 for r in top2)
    # insert a duplicate of vec 0 under a new id → it becomes the nearest
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(99999).cast("bigint"))
    t.insert(dup)
    top3 = t.knn("embedding", q, k=3, nprobe=4).collect()
    assert top3[0]["vec_id"] == 99999
    # compact folds everything; results unchanged
    t.compact()
    top4 = t.knn("embedding", q, k=3, nprobe=4).collect()
    assert [r["vec_id"] for r in top4] == [r["vec_id"] for r in top3]


def test_bm25_through_table(tables):
    docs = tables["documents"]
    t = LanternTable(docs, "doc_id").create_bm25("text")
    out = t.search_bm25("spark window merge", limit=5).collect()
    assert 0 < len(out) <= 5
    assert out[0]["bm25"] >= out[-1]["bm25"]


def test_validate_reports_recall(emb):
    t = LanternTable(emb, "vec_id").create_index("embedding", kind="ivf", nlist=4, seed=42)
    rec = t.validate("embedding", k=5, n_queries=3)
    assert 0.0 <= rec <= 1.0
    # full probe in auto mode defaults nprobe=4 → exact-equivalent? default
    # nprobe is ivf_search's default (4 == nlist here) so recall is 1
    assert rec == pytest.approx(1.0)


def test_insert_does_not_leak_index_columns(emb):
    t = LanternTable(emb, "vec_id").create_index("embedding", kind="ivf", nlist=4, seed=42)
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(99999).cast("bigint"))
    t.insert(dup)
    assert t.df.columns == emb.columns  # no cluster_id in the user schema
    t.compact()
    assert t.df.columns == emb.columns  # compact must not bake it in either


def test_srp_index_sees_deltas_and_tombstones(emb):
    t = LanternTable(emb, "vec_id").create_index("embedding", kind="srp", nbits=64, seed=42)
    q = qvec(emb, 0)
    t.delete([0])
    n = emb.count()
    top = t.knn("embedding", q, k=3, oversample=max(1, n // 3 + 1)).collect()
    assert all(r["vec_id"] != 0 for r in top)
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(77777).cast("bigint"))
    t.insert(dup)
    top2 = t.knn("embedding", q, k=3, oversample=max(1, n // 3 + 1)).collect()
    assert top2[0]["vec_id"] == 77777


def test_weighted_search_routes_through_index(tables):
    """With an SRP index on v1 and full oversample, index-backed candidate
    mode equals exact candidate mode; deleting a row removes it from
    results; pending deltas fall back to exact scans (stale-index guard)."""
    from pyspark.sql import functions as F

    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
    )
    q1 = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    terms = [(1.0, "v1", q1), (0.5, "v2", list(reversed(q1)))]

    t = LanternTable(df, "id").create_index("v1", kind="srp", nbits=64, seed=7)
    exact = t.weighted_search(terms, ef=50, limit=10, indexes={}).collect()
    routed = t.weighted_search(terms, ef=50, limit=10).collect()
    assert [r["id"] for r in routed] == [r["id"] for r in exact]

    victim = routed[0]["id"]
    t.delete([victim])
    after = t.weighted_search(terms, ef=50, limit=10).collect()
    assert victim not in {r["id"] for r in after}

    t.insert(df.limit(0))  # pending (empty) delta → exact-scan fallback
    fallback = t.weighted_search(terms, ef=50, limit=10).collect()
    assert {r["id"] for r in fallback} == {r["id"] for r in after}


def test_get_indexes_catalog_and_staleness(emb):
    """ldb_get_indexes analogue: one row per structure with kind/params,
    and the stale flag flips when deltas/tombstones are pending."""
    t = LanternTable(emb, "vec_id").create_index("embedding", kind="ivf", nlist=4, seed=1)
    t.create_pq("embedding", splits=4, clusters=4, seed=1)
    cat = {(e["kind"], e["column"]): e for e in t.get_indexes()}
    assert ("ivf", "embedding") in cat and ("pq", "embedding") in cat
    assert cat[("ivf", "embedding")]["params"]["nlist"] == 4
    assert not cat[("ivf", "embedding")]["stale"]
    t.delete([0])
    assert all(e["stale"] for e in t.get_indexes())
    t.compact()
    assert not any(e["stale"] for e in t.get_indexes())


def test_reindex_retrains_with_original_params(emb):
    """REINDEX analogue: folds churn into the base, rebuilds from scratch
    with the original build params, and the rebuilt index serves correct
    results (deleted row gone, inserted row findable)."""
    half = emb.filter(F.col("vec_id") < 400)
    rest = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 420))
    t = LanternTable(half, "vec_id").create_index("embedding", kind="ivf", nlist=4, seed=1)
    t.insert(rest).delete([1, 2])
    t.reindex()
    assert not t._deltas and not t._tombstones
    cat = {(e["kind"], e["column"]): e for e in t.get_indexes()}
    assert cat[("ivf", "embedding")]["params"]["nlist"] == 4
    # full-probe search == exact knn on the visible rows (correctness)
    q = qvec(emb, 410)
    got = [r["vec_id"] for r in t.knn("embedding", q, k=5, nprobe=4).collect()]
    exact = [r["vec_id"] for r in knn(t.df, "embedding", q, k=5, id_col="vec_id").collect()]
    assert got == exact
    assert 410 in set(got)  # inserted row visible (self-nearest)
    assert 1 not in set(got) and 2 not in set(got)


def test_table_profile_and_check(spark, tables):
    from lanterndb_spark.table import LanternTable

    t = LanternTable(tables["documents"], id_col="doc_id")
    p = {r["column"]: r for r in t.profile(["doc_id", "lang"]).collect()}
    assert p["doc_id"]["n_null"] == 0 and p["lang"]["n_distinct"] == 5

    out = {r["rule"]: r["violations"] for r in t.check(
        [{"kind": "unique", "table": "self", "cols": ["doc_id"]},
         {"kind": "range", "table": "self", "col": "n_chars", "min": 0, "max": 100}]
    ).collect()}
    assert out["unique(self.doc_id)"] == 0
    assert out["range(self.n_chars in [0,100])"] > 0

    # visibility: profile reflects deletes
    t2 = t.delete([0, 1, 2])
    n = t2.profile(["doc_id"]).collect()[0]["n"]
    assert n == tables["documents"].count() - 3


def test_table_near_dup_check(spark, tables):
    from pyspark.sql import functions as F
    from lanterndb_spark.table import LanternTable

    docs = tables["documents"].select("doc_id", "text")
    t = LanternTable(docs, id_col="doc_id")
    batch = docs.limit(2).select((F.col("doc_id") + 900_000).alias("doc_id"), "text")
    hits = t.near_dup_check(batch, threshold=0.9).collect()
    # every batch doc (a twin of a table doc) is flagged against it
    assert {r["id_b"] for r in hits} == {r["doc_id"] for r in batch.collect()}
    assert all(r["jaccard"] == 1.0 for r in hits if r["id_a"] == r["id_b"] - 900_000)


def test_table_quality_surface(spark, tables):
    from lanterndb_spark.table import LanternTable

    t = LanternTable(tables["documents"], id_col="doc_id")
    h = t.histogram("n_chars", bins=10).collect()
    assert len(h) == 10 and sum(r["n"] for r in h) == tables["documents"].count()
    o = t.outliers("n_chars", ["lang"], k=2.0)
    assert {"robust_z", "is_outlier"} <= set(o.columns)
    p = t.exact_dup_pairs(threshold=0.9)
    assert {"id_a", "id_b", "jaccard"} <= set(p.columns)


def test_table_scd2_surface(spark):
    from datetime import datetime
    from lanterndb_spark.table import LanternTable

    log = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "bronze"),
         (1, datetime(2024, 1, 5), "gold"),
         (2, datetime(2024, 1, 2), "silver")],
        "uid int, ts timestamp, tier string",
    )
    t = LanternTable(log, id_col="uid")
    hist = t.history("ts", ["tier"])
    assert hist.count() == 3
    snap = {r["uid"]: r["tier"]
            for r in t.snapshot_at("ts", ["tier"], "2024-01-03 00:00:00").collect()}
    assert snap == {1: "bronze", 2: "silver"}


def test_table_drift_vs(spark, tables):
    from lanterndb_spark.table import LanternTable

    docs = tables["documents"]
    t = LanternTable(docs, id_col="doc_id")
    d = t.drift_vs(docs, "n_chars", bins=8).collect()
    assert len(d) == 8 and abs(sum(r["contrib"] for r in d)) < 1e-9


def test_table_ivfsq_index_route(spark, tables):
    from lanterndb_spark.operators.knn import knn as exact
    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    n = emb.count()
    t = LanternTable(emb, id_col="vec_id").create_index(
        "embedding", kind="ivfsq", nlist=8, seed=42
    )
    q = [float(x) for x in
         emb.filter("vec_id = 2").first()["embedding"]]
    got = [r["vec_id"] for r in
           t.knn("embedding", q, k=10, nprobe=8, refine=(n + 9) // 10).collect()]
    want = [r["vec_id"] for r in
            exact(emb, "embedding", q, k=10, id_col="vec_id").collect()]
    assert got == want  # full probe + refine == exact through the table API
    cat = {i["column"]: i for i in t.get_indexes()}
    assert cat["embedding"]["kind"] == "ivfsq"
    assert cat["embedding"]["params"]["nlist"] == 8
    import pytest as _pt
    with _pt.raises(ValueError):
        t.knn("embedding", q, k=5, metric="cos")


def test_table_spans_and_project_surface(spark, tables):
    from lanterndb_spark.table import LanternTable

    t = LanternTable(tables["documents"], "doc_id")
    spans = t.repeated_spans(min_len=10, min_docs=2)
    assert set(spans.columns) == {"doc_id", "span_start", "span_end", "span_tokens"}
    masked = t.mask_spans(min_len=10, min_docs=2)
    assert "text_deduped" in masked.columns and "tokens_removed" in masked.columns

    e = LanternTable(tables["embeddings"], "vec_id")
    jl = e.project("embedding", 16, method="jl", seed=1)
    assert jl.filter(jl["proj"].isNotNull()).count() == tables["embeddings"].count()
    pca = e.project("embedding", 8, method="pca", seed=1)
    import pyspark.sql.functions as F
    assert pca.filter(F.size("proj") != 8).count() == 0


def test_table_subset_pairs_surface(spark, tables):
    from lanterndb_spark.table import LanternTable

    t = LanternTable(tables["documents"], "doc_id")
    p = t.subset_pairs(threshold=0.8)
    assert {"id_sub", "id_super", "containment"} <= set(p.columns)


def test_table_proj_index_route(spark):
    import numpy as np
    import pytest as _pt

    from lanterndb_spark.operators.knn import knn as exact
    from lanterndb_spark.table import LanternTable

    rs = np.random.RandomState(9)
    B = rs.standard_normal((6, 32))
    Z = rs.standard_normal((300, 6)) @ B + 0.01 * rs.standard_normal((300, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in Z[i]]) for i in range(300)],
        "vec_id long, emb array<float>",
    )
    t = LanternTable(df, id_col="vec_id").create_index(
        "emb", kind="proj", method="pca", out_dim=8, seed=1
    )
    q = [float(x) for x in Z[7]]
    got = [r["vec_id"] for r in t.knn("emb", q, k=10, oversample=4).collect()]
    want = [r["vec_id"] for r in exact(df, "emb", q, k=10, id_col="vec_id").collect()]
    assert got == want
    cat = {i["column"]: i for i in t.get_indexes()}
    assert cat["emb"]["kind"] == "proj"
    with _pt.raises(ValueError):
        t.knn("emb", q, k=5, metric="cos")

    # visibility contract: an inserted twin of the query surfaces at
    # rank 1 (projected with the index's matrix, no refit); deleting it
    # restores the original result
    twin = spark.createDataFrame([(9_000, q)], "vec_id long, emb array<float>")
    t2 = t.insert(twin)
    got2 = [r["vec_id"] for r in t2.knn("emb", q, k=3, oversample=4).collect()]
    assert 9_000 in got2
    t3 = t2.delete([9_000])
    got3 = [r["vec_id"] for r in t3.knn("emb", q, k=10, oversample=4).collect()]
    assert got3 == want


def test_compact_folds_proj_and_ivfsq_indexes(spark, tables):
    """compact() must fold deltas/tombstones into 'proj' and 'ivfsq'
    index row-sets too — before the fix they were skipped, so a
    compacted table's proj/ivfsq route silently served deleted rows and
    missed inserted ones (the staleness compact exists to prevent)."""
    import numpy as np

    from lanterndb_spark.operators.knn import knn as exact
    from lanterndb_spark.table import LanternTable

    rs = np.random.RandomState(11)
    B = rs.standard_normal((6, 32))
    Z = rs.standard_normal((200, 6)) @ B + 0.01 * rs.standard_normal((200, 32))
    df = spark.createDataFrame(
        [(i, [float(x) for x in Z[i]]) for i in range(200)],
        "vec_id long, emb array<float>",
    )
    q = [float(x) for x in Z[5]]
    t = LanternTable(df, id_col="vec_id").create_index(
        "emb", kind="proj", method="pca", out_dim=8, seed=1
    )
    twin = spark.createDataFrame([(9_100, q)], "vec_id long, emb array<float>")
    t.insert(twin).delete([5]).compact()
    assert not t._deltas and not t._tombstones
    got = [r["vec_id"] for r in t.knn("emb", q, k=5, oversample=4).collect()]
    assert got[0] == 9_100 and 5 not in got  # insert visible, delete gone

    emb = tables["embeddings"]
    n = emb.count()
    t2 = LanternTable(emb, id_col="vec_id").create_index(
        "embedding", kind="ivfsq", nlist=8, seed=42
    )
    q2 = [float(x) for x in emb.filter("vec_id = 2").first()["embedding"]]
    twin2 = spark.createDataFrame(
        [(9_200, q2)], "vec_id long, embedding array<float>"
    )
    t2.insert(twin2).delete([2]).compact()
    got2 = [r["vec_id"] for r in
            t2.knn("embedding", q2, k=5, nprobe=8, refine=(n + 9) // 10).collect()]
    assert got2[0] == 9_200 and 2 not in got2
    # and the folded index still agrees with exact on the visible rows
    want2 = [r["vec_id"] for r in
             exact(t2.df, "embedding", q2, k=5, id_col="vec_id").collect()]
    assert got2 == want2


def test_upsert_merge_semantics(spark, tables):
    """upsert(): matched keys replaced, unmatched inserted, untouched
    rows pass through — and an existing ANN index keeps serving the
    post-upsert truth."""
    from pyspark.sql import functions as F

    from lanterndb_spark.table import LanternTable

    cust = tables["customer"]
    t = LanternTable(cust, "c_custkey")
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_mktsegment", F.lit("UPSERTED"))
    )
    inserts = cust.filter(F.col("c_custkey") % 50 == 7).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1_000_000)
    )
    n_base = cust.count()
    n_upd = updates.count()
    n_new = inserts.count()
    t.upsert(updates.unionByName(inserts)).compact()
    assert t.df.count() == n_base + n_new
    assert t.df.filter(F.col("c_mktsegment") == "UPSERTED").count() == n_upd
    # matched keys hold the NEW version only
    assert (
        t.df.filter((F.col("c_custkey") % 10 == 0)
                    & (F.col("c_custkey") < 1_000_000)
                    & (F.col("c_mktsegment") != "UPSERTED")).count() == 0
    )


def test_reindex_and_drop_retire_hnsw_graphs(spark, tables):
    """reindex() and drop_index() must unpersist the replaced/dropped
    hnsw generations (persisted blobs are never auto-evicted)."""
    from pyspark.sql import functions as F

    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", m=8, ef_construction=64, num_shards=2, seed=42
    )
    old_graphs = t._indexes["embedding"][1].graphs
    t.reindex()
    assert t._indexes["embedding"][1].graphs is not old_graphs
    assert old_graphs.storageLevel.useMemory is False  # unpersisted
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = [r["vec_id"] for r in t.knn("embedding", q, k=5, ef=emb.count()).collect()]
    want = [r["vec_id"] for r in t.knn("embedding", q, k=5, mode="exact").collect()]
    assert got == want  # rebuilt index still serves exactly
    cur = t._indexes["embedding"][1].graphs
    t.drop_index("embedding")
    assert cur.storageLevel.useMemory is False


def test_create_index_replacement_retires_hnsw_graphs(spark, tables):
    """Rebuilding an hnsw index over the same column (e.g. to change m)
    must unpersist the replaced generation at the replacement point."""
    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", m=8, ef_construction=64, num_shards=2, seed=42
    )
    old_graphs = t._indexes["embedding"][1].graphs
    t.create_index("embedding", kind="hnsw", m=4, ef_construction=32,
                   num_shards=2, seed=42)
    assert old_graphs.storageLevel.useMemory is False
    t.drop_index("embedding")


def test_create_index_target_recall_selection(tables, spark):
    """find_best_variant analogue (index_autotune/mod.rs:161-186): with
    target_recall set, create_index runs the grid on a sample, builds
    with the winning m, and the chosen ef becomes the column's knn
    default — while explicit kwargs still override."""
    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", target_recall=0.9,
        m_grid=(8,), ef_grid=(8, 64), tune_queries=3,
        num_shards=2, seed=42,
    )
    cat = {i["column"]: i for i in t.get_indexes()}
    tune = cat["embedding"]["params"]["autotune"]
    assert tune["target_recall"] == 0.9
    assert 0.0 <= tune["achieved_recall"] <= 1.0
    assert tune["ef"] in (8, 64)
    assert t._tuned_search["embedding"]["ef"] == tune["ef"]
    # the tuned default actually applies (and can be overridden)
    q = [float(x) for x in emb.first()["embedding"]]
    got = [r["vec_id"] for r in t.knn("embedding", q, k=5).collect()]
    assert emb.first()["vec_id"] in got
    got2 = [r["vec_id"] for r in
            t.knn("embedding", q, k=5, ef=emb.count()).collect()]
    exact = [r["vec_id"] for r in
             t.knn("embedding", q, k=5, mode="exact").collect()]
    assert got2 == exact
    # non-hnsw kinds refuse the knob loudly
    import pytest

    with pytest.raises(ValueError, match="target_recall"):
        LanternTable(emb, "vec_id").create_index(
            "embedding", kind="ivf", target_recall=0.9
        )


def test_tuned_knobs_cleared_on_drop_and_rebuild(tables, spark):
    """ADVICE r6: autotuned ef must not survive drop_index or a rebuild
    without target_recall — stale knobs measured against a different
    build would silently become knn defaults."""
    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", target_recall=0.5,
        m_grid=(8,), ef_grid=(8,), tune_queries=2,
        num_shards=2, seed=42,
    )
    assert "embedding" in t._tuned_search
    t.drop_index("embedding")
    assert "embedding" not in t._tuned_search
    # rebuild with target_recall repopulates; an untuned rebuild clears
    t.create_index(
        "embedding", kind="hnsw", target_recall=0.5,
        m_grid=(8,), ef_grid=(8,), tune_queries=2,
        num_shards=2, seed=42,
    )
    assert "embedding" in t._tuned_search
    t.create_index("embedding", kind="hnsw", m=8, ef_construction=32,
                   num_shards=2, seed=42)
    assert "embedding" not in t._tuned_search
    t.drop_index("embedding")


def _qdf(spark, emb, ids):
    return (
        emb.filter(F.col("vec_id").isin(ids))
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("query"))
    )


def _by_q(rows):
    out = {}
    for r in rows:
        out.setdefault(r["q_id"], []).append((r["vec_id"], round(r["dist"], 6)))
    return out


def test_knn_batch_routes_and_agrees(tables, spark):
    emb = tables["embeddings"]
    qdf = _qdf(spark, emb, [0, 7, 13])
    # exact route (no index) is the ground truth
    t0 = LanternTable(emb, "vec_id")
    exact = _by_q(t0.knn_batch("embedding", qdf, k=5).collect())
    assert set(exact) == {0, 7, 13} and all(len(v) == 5 for v in exact.values())
    # hnsw route at full probe == exact
    n = emb.count()
    th = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", num_shards=4, seed=42
    )
    got_h = _by_q(th.knn_batch("embedding", qdf, k=5, ef=n).collect())
    assert got_h == exact
    # ivf route at nprobe=nlist == exact
    ti = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="ivf", nlist=4, seed=42
    )
    got_i = _by_q(ti.knn_batch("embedding", qdf, k=5, nprobe=4).collect())
    assert got_i == exact
    # srp falls back to the exact lateral join
    ts = LanternTable(emb, "vec_id").create_index("embedding", kind="srp", seed=42)
    got_s = _by_q(ts.knn_batch("embedding", qdf, k=5).collect())
    assert got_s == exact


def test_knn_batch_delta_tombstone_visibility(tables, spark):
    emb = tables["embeddings"]
    n = emb.count()
    qdf = _qdf(spark, emb, [0])
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", num_shards=2, seed=42
    )
    base_ids = [r["vec_id"] for r in t.knn_batch("embedding", qdf, k=5, ef=n).collect()]
    assert base_ids[0] == 0
    # tombstone the top hit: it must vanish from the batch results
    t.delete([0])
    after = [r["vec_id"] for r in t.knn_batch("embedding", qdf, k=5, ef=n).collect()]
    assert 0 not in after
    # insert a twin of the query vector: it must surface at rank 1
    twin = emb.filter(F.col("vec_id") == 7).select(
        F.lit(990001).cast("bigint").alias("vec_id"),
        F.col("label"), F.col("embedding"),
    ).select(*emb.columns)
    qdf7 = _qdf(spark, emb, [7])
    t.insert(twin)
    rows = sorted(
        t.knn_batch("embedding", qdf7, k=3, ef=n).collect(),
        key=lambda r: (r["dist"], r["vec_id"]),
    )
    top2 = {r["vec_id"] for r in rows[:2]}
    assert top2 == {7, 990001}


def test_knn_batch_pred_filtered(tables, spark):
    emb = tables["embeddings"]
    n = emb.count()
    qdf = _qdf(spark, emb, [0, 7])
    pred = F.col("label") == 1
    # ground truth: exact lateral over the pre-filtered table
    t0 = LanternTable(emb, "vec_id")
    want = _by_q(t0.knn_batch("embedding", qdf, k=4, pred=pred).collect())
    assert all(len(v) == 4 for v in want.values())
    # hnsw route: batch streaming-k, full-probe rounds converge to exact
    th = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", num_shards=2, seed=42
    )
    got_h = _by_q(
        th.knn_batch("embedding", qdf, k=4, pred=pred, ef=n).collect()
    )
    assert got_h == want
    # ivf route at nprobe=nlist: filter composes before the re-rank
    ti = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="ivf", nlist=4, seed=42
    )
    got_i = _by_q(
        ti.knn_batch("embedding", qdf, k=4, pred=pred, nprobe=4).collect()
    )
    assert got_i == want


def test_search_bm25_batch_uses_prebuilt_postings(tables, spark):
    """The batch router reuses the table's postings snapshot (no
    rebuild) and matches the single-query router query for query."""
    from lanterndb_spark.operators import bm25 as bm25_mod

    docs = tables["documents"]
    t = LanternTable(docs, "doc_id").create_bm25("text")
    qs = ["spark window merge", "broadcast join plan"]
    qdf = spark.createDataFrame(list(enumerate(qs)), "q_id int, query string")

    orig = bm25_mod.build_postings
    calls = []
    bm25_mod.build_postings = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        batch = t.search_bm25_batch(qdf, limit=5, round_scores=6).collect()
    finally:
        bm25_mod.build_postings = orig
    assert not calls, "batch router must reuse the prebuilt postings"
    got = {}
    for r in sorted(batch, key=lambda r: (r["q_id"], -r["bm25"], r["doc_id"])):
        got.setdefault(r["q_id"], []).append((r["doc_id"], r["bm25"]))
    for qi, q in enumerate(qs):
        single = [
            (r["doc_id"], r["bm25"])
            for r in t.search_bm25(q, limit=5, round_scores=6).collect()
        ]
        assert got.get(qi, []) == single


def test_weighted_search_batch_routes_index_and_deltas(tables, spark):
    """A fresh ivf index routes the term's candidates through the batch
    ANN form; pending deltas force exact candidate scans (stale-index
    rule, same as the single-query router)."""
    emb2 = tables["embeddings"].select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse(F.col("embedding")).alias("v2"),
        "label",
    )
    t = LanternTable(emb2, "id").create_index("v1", kind="ivf", nlist=4, seed=42)
    r = emb2.filter(F.col("id") == 0).first()
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in r["v1"]], [float(x) for x in r["v2"]])],
        "q_id int, qv1 array<double>, qv2 array<double>",
    )
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]
    # full probe == exact candidates, so indexed == forced-exact results
    via_idx = t.weighted_search_batch(terms, qdf, ef=30, limit=10, nprobe=4).collect()
    exact = t.weighted_search_batch(terms, qdf, ef=30, limit=10, indexes={}).collect()
    key = lambda rows: sorted(
        (r["q_id"], r["id"], round(r["joint_dist"], 9)) for r in rows
    )
    assert key(via_idx) == key(exact)

    # single-query twin agrees on the same query
    single = t.weighted_search(
        [(1.0, "v1", [float(x) for x in r["v1"]]),
         (0.5, "v2", [float(x) for x in r["v2"]])],
        ef=30, limit=10,
    ).collect()
    assert [(x["id"], round(x["joint_dist"], 9)) for x in sorted(
        via_idx, key=lambda x: (x["joint_dist"], x["id"]))] == [
        (x["id"], round(x["joint_dist"], 9)) for x in single
    ]

    # pending deltas -> the router must NOT hand a stale index to the op
    delta = emb2.limit(0)
    t2 = t.insert(delta)
    assert t2._deltas  # still pending
    out = t2.weighted_search_batch(terms, qdf, ef=30, limit=10).collect()
    assert key(out) == key(exact)


def test_knn_batch_exact_route_caps_query_volume(tables, spark):
    """The exact lateral-join fallback must refuse >100k queries loudly
    (knn_join broadcasts the batch in BOTH impls) and name the remedy."""
    emb = tables["embeddings"]
    t = LanternTable(emb, "vec_id")
    v = [float(x) for x in emb.first()["embedding"]]
    big = spark.range(100_001).select(
        F.col("id").cast("int").alias("q_id"),
        F.array(*[F.lit(x) for x in v]).alias("query"),
    )
    with pytest.raises(ValueError, match="100000|broadcasts"):
        t.knn_batch("embedding", big, k=3)


def test_knn_batch_string_q_ids_all_routes(tables, spark):
    """String-keyed query frames work on EVERY knn_batch route — exact,
    ivf (native pass-through), and hnsw incl. the delta-merge path
    (surrogate-key wrap) — answering what the long-keyed run answers."""
    emb = tables["embeddings"]
    n = emb.count()
    qdf = _qdf(spark, emb, [0, 7])
    sdf = qdf.select(
        F.concat(F.lit("e/"), F.col("q_id").cast("string")).alias("q_id"),
        "query",
    )

    def rekey(by_q):
        return {f"e/{k}": v for k, v in by_q.items()}

    t0 = LanternTable(emb, "vec_id")
    assert _by_q(t0.knn_batch("embedding", sdf, k=5).collect()) == rekey(
        _by_q(t0.knn_batch("embedding", qdf, k=5).collect())
    )
    ti = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="ivf", nlist=4, seed=42
    )
    assert _by_q(
        ti.knn_batch("embedding", sdf, k=5, nprobe=2).collect()
    ) == rekey(_by_q(ti.knn_batch("embedding", qdf, k=5, nprobe=2).collect()))
    th = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="hnsw", num_shards=2, seed=42
    )
    # pending delta forces the graph-top ∪ delta-top merge window
    twin = emb.filter(F.col("vec_id") == 7).select(
        F.lit(990002).cast("bigint").alias("vec_id"),
        F.col("label"), F.col("embedding"),
    ).select(*emb.columns)
    th.insert(twin)
    got_s = _by_q(th.knn_batch("embedding", sdf, k=3, ef=n).collect())
    got_l = rekey(_by_q(th.knn_batch("embedding", qdf, k=3, ef=n).collect()))
    assert got_s == got_l
    assert any(v == 990002 for vs in got_s.values() for v, _ in vs)


def test_table_ivfpq_index_lifecycle(tables, spark):
    """kind='ivfpq' (the reference's pq=true reloption): knn and
    knn_batch route through the ADC composite and equal the exact scan
    at full probe + covering refine; deltas become visible (codes
    re-derive against the frozen codebook) and compact folds them;
    get_indexes surfaces nlist + splits; non-l2sq raises."""
    import pytest as _pytest

    emb = tables["embeddings"]
    n = emb.count()
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="ivfpq", nlist=4, splits=8, clusters=16, seed=42
    )
    cat = {e["column"]: e for e in t.get_indexes() if e["kind"] == "ivfpq"}
    assert cat["embedding"]["params"]["nlist"] == 4
    assert cat["embedding"]["params"]["splits"] == 8

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = [r["vec_id"] for r in t.knn(
        "embedding", q, k=5, nprobe=4, refine=(n + 4) // 5
    ).collect()]
    from lanterndb_spark.operators.knn import knn as exact_knn
    want = [r["vec_id"] for r in exact_knn(
        emb, "embedding", q, k=5, id_col="vec_id"
    ).collect()]
    assert got == want
    with _pytest.raises(ValueError, match="l2sq"):
        t.knn("embedding", q, k=5, metric="cos")

    qdf = _qdf(spark, emb, [0, 7])
    exact = _by_q(LanternTable(emb, "vec_id").knn_batch("embedding", qdf, k=5).collect())
    got_b = _by_q(t.knn_batch(
        "embedding", qdf, k=5, nprobe=4, refine=(n + 4) // 5
    ).collect())
    assert got_b == exact

    # delta twin surfaces through the batch route, then compact folds it
    twin = emb.filter(F.col("vec_id") == 7).select(
        F.lit(990004).cast("bigint").alias("vec_id"),
        F.col("label"), F.col("embedding"),
    ).select(*emb.columns)
    t.insert(twin)
    rows = t.knn_batch(
        "embedding", qdf, k=3, nprobe=4, refine=(n + 4) // 5
    ).collect()
    assert 990004 in [r["vec_id"] for r in rows if r["q_id"] == 7]
    t.compact()
    kind, idx = t._indexes["embedding"]
    assert kind == "ivfpq" and idx.assigned.filter(
        F.col("vec_id") == 990004
    ).count() == 1

    # hybrid candidate mode accepts the ivfpq handle as an ivf candidate
    got_w = t.weighted_search([(1.0, "embedding", q)], ef=n, limit=5)
    assert [r["vec_id"] for r in got_w.collect()] == want


def test_knn_batch_duplicate_detection_runs_once(tables, spark, monkeypatch):
    """Pin the table.py router contract (VERDICT r12): knn_batch runs
    AT MOST ONE duplicate-q_id detection aggregate end-to-end — the
    router detects + wraps once and passes unique_q_ids=True inward on
    every route, so a future route addition can't silently stack a
    second aggregate per call. Counted by patching the shared
    _has_duplicate_qids, which every route resolves through the hnsw
    module at call time."""
    import lanterndb_spark.operators.hnsw as hnsw_mod

    emb = tables["embeddings"]
    n = emb.count()
    qa = qvec(emb, 1)
    qb = qvec(emb, 9)
    dup = spark.createDataFrame(
        [(7, qa), (7, qb)], "q_id long, query array<double>"
    )
    real = hnsw_mod._has_duplicate_qids
    calls = {"n": 0}

    def counting(queries, q_id_col):
        calls["n"] += 1
        return real(queries, q_id_col)

    monkeypatch.setattr(hnsw_mod, "_has_duplicate_qids", counting)
    cases = [
        (None, None, {}),
        ("hnsw",
         {"m": 8, "ef_construction": 64, "num_shards": 2, "seed": 42},
         {"ef": n}),
        ("ivf", {"nlist": 4, "seed": 42}, {"nprobe": 4}),
        ("ivfsq", {"nlist": 4, "seed": 42},
         {"nprobe": 4, "refine": (n + 4) // 5}),
        ("ivfpq", {"nlist": 4, "splits": 8, "clusters": 16, "seed": 42},
         {"nprobe": 4, "refine": (n + 4) // 5}),
    ]
    for kind, params, kw in cases:
        t = LanternTable(emb, "vec_id")
        if kind:
            t = t.create_index("embedding", kind=kind, **params)
        calls["n"] = 0
        out = t.knn_batch("embedding", dup, k=5, **kw)
        assert out.count() == 10, kind  # 2 rows x k: per-row semantics
        assert calls["n"] == 1, f"{kind}: detection ran {calls['n']}x"


def test_knn_batch_dup_wrap_release_frees_blocks(tables, spark):
    """release() must be called on the knn_batch RETURN object (r13
    advice): _restore_surrogate sets __dict__ attachments on that
    object, and they do NOT propagate through withColumn/union — a
    release() on a derived frame is a silent no-op and the surrogate
    localCheckpoint blocks (+ the ivf route's persisted routed frame)
    leak in a long-lived driver JVM.

    Asserts on the SPECIFIC RDD ids this test creates (set diffs), not
    the global persistent count — other modules' non-blocking unpersists
    drain the global map concurrently under full-suite ordering (the r13
    flake class; this test tripped it in the r14 full run), while our own
    ids are race-free (unpersist removes synchronously; ids never reuse)."""
    from lanterndb_spark.plans.shape import release

    emb = tables["embeddings"]
    qa = qvec(emb, 1)
    qb = qvec(emb, 9)
    dup = spark.createDataFrame(
        [(7, qa), (7, qb)], "q_id long, query array<double>"
    )
    t = LanternTable(emb, "vec_id").create_index(
        "embedding", kind="ivf", nlist=4, seed=42
    )

    def pids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    # warmup absorbs any lazily-persisted index state
    w = t.knn_batch("embedding", dup, k=5, nprobe=2)
    w.collect()
    release(w)
    before = pids()

    out = t.knn_batch("embedding", dup, k=5, nprobe=2)
    derived = out.withColumn("backend", F.lit("ivf"))  # the bug's shape
    derived.collect()
    # `created` attributes every RDD persisted between the snapshots to
    # this test — fine under sequential pytest (the warmup above absorbs
    # shared-fixture lazy persists); if this ever flakes, snapshot
    # tightly around derived.collect() or filter `created` to the ids
    # release(out) is contractually responsible for (r14 ADVICE note)
    created = pids() - before
    assert created  # wrap pinned blocks
    release(derived)  # no-op: attachments live on `out`
    assert created & pids() == created  # still pinned — derived is a no-op
    release(out)  # the contract: release the knn_batch result itself
    assert not (created & pids())  # every block the wrap pinned is freed
