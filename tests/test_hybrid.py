import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.hybrid import weighted_vector_search
from lanterndb_spark.functions.distance import l2sq_dist, query_vec


@pytest.fixture(scope="module")
def hybrid_df(tables):
    # two vector columns: the embedding and its reverse
    return tables["embeddings"].select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse(F.col("embedding")).alias("v2"),
        "label",
    )


def q_of(df, i):
    r = df.filter(F.col("id") == i).first()
    return [float(x) for x in r["v1"]], [float(x) for x in r["v2"]]


def test_exact_mode_matches_manual_joint(hybrid_df):
    q1, q2 = q_of(hybrid_df, 0)
    got = weighted_vector_search(
        hybrid_df, [(1.0, "v1", q1), (0.5, "v2", q2)], exact=True, limit=5
    ).collect()
    manual = (
        hybrid_df.withColumn(
            "jd", l2sq_dist("v1", query_vec(q1)) + F.lit(0.5) * l2sq_dist("v2", query_vec(q2))
        )
        .orderBy("jd", "id")
        .limit(5)
        .collect()
    )
    assert [r["id"] for r in got] == [r["id"] for r in manual]
    for g, m in zip(got, manual):
        assert g["joint_dist"] == pytest.approx(m["jd"])


def test_candidate_mode_subset_of_exact_with_full_ef(hybrid_df):
    n = hybrid_df.count()
    q1, q2 = q_of(hybrid_df, 1)
    terms = [(1.0, "v1", q1), (1.0, "v2", q2)]
    cand = weighted_vector_search(hybrid_df, terms, ef=n, limit=10).collect()
    exact = weighted_vector_search(hybrid_df, terms, exact=True, limit=10).collect()
    # with ef == table size the candidate path must equal exact
    assert [r["id"] for r in cand] == [r["id"] for r in exact]


def test_max_dist_filter(hybrid_df):
    q1, q2 = q_of(hybrid_df, 2)
    terms = [(1.0, "v1", q1), (1.0, "v2", q2)]
    full = weighted_vector_search(hybrid_df, terms, exact=True).collect()
    cutoff = full[5]["joint_dist"]
    expected = sum(1 for r in full if r["joint_dist"] < cutoff)
    filtered = weighted_vector_search(hybrid_df, terms, exact=True, max_dist=cutoff).collect()
    assert len(filtered) == expected > 0
    assert all(r["joint_dist"] < cutoff for r in filtered)


def test_candidate_mode_dedups(hybrid_df):
    q1, q2 = q_of(hybrid_df, 3)
    out = weighted_vector_search(hybrid_df, [(1.0, "v1", q1), (1.0, "v2", q2)], ef=50)
    ids = [r["id"] for r in out.collect()]
    assert len(ids) == len(set(ids))


def test_hybrid_index_backed_candidates_match_exact_scan(tables):
    """Index-backed candidate mode (the reference's real shape: each
    per-column candidate query rides its ANN index) must equal the
    exact-scan candidate mode when the index probes everything."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search
    from lanterndb_spark.operators.lsh import build_srp

    emb = tables["embeddings"]
    n = emb.count()
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
    )
    q1 = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    q2 = list(reversed(q1))
    terms = [(1.0, "v1", q1), (0.5, "v2", q2)]
    exact_scan = weighted_vector_search(df, terms, ef=50, limit=20).collect()
    idx = build_srp(df, "v1", nbits=64, seed=7)
    # full-probe SRP (oversample covers the table) == exact candidates
    idx_backed = weighted_vector_search(
        df, terms, ef=50, limit=20, indexes={"v1": idx}
    )
    # inflate oversample by searching with k=ef on the full table: ef=50,
    # oversample default 10 -> 500 >= n, so candidates are exact top-50
    assert n <= 500
    got = idx_backed.collect()
    assert [r["id"] for r in got] == [r["id"] for r in exact_scan]
    assert [round(r["joint_dist"], 9) for r in got] == [
        round(r["joint_dist"], 9) for r in exact_scan
    ]


def test_weighted_search_hnsw_candidate_index(spark, tables):
    """weighted_search candidate mode probes a column's HNSW index —
    the reference's per-column index-backed candidate queries
    (lantern.sql:769-806) on the namesake backend. With ef spanning the
    table, candidate mode must equal the exact run."""
    from pyspark.sql import functions as F

    from lanterndb_spark.operators.hybrid import weighted_vector_search
    from lanterndb_spark.table import LanternTable

    emb = tables["embeddings"]
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v1"),
        F.reverse("embedding").alias("v2"),
    )
    q1 = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    terms = [(1.0, "v1", q1), (0.5, "v2", list(reversed(q1)))]
    t = LanternTable(df, "id").create_index(
        "v1", kind="hnsw", m=8, ef_construction=64, num_shards=2, seed=42
    )
    n = df.count()
    got = [r["id"] for r in t.weighted_search(terms, ef=n, limit=10).collect()]
    want = [r["id"] for r in weighted_vector_search(
        df, terms, id_col="id", ef=n, limit=10, exact=True).collect()]
    assert got == want


# ---------------------------------------------------------------- search_df


def test_batch_matches_single_query(hybrid_df, spark):
    """weighted_vector_search_df == the single-query candidate form,
    query for query (same per-term ef budget, same (joint, id) order)."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    qids = [0, 7, 13]
    qs = {i: q_of(hybrid_df, i) for i in qids}
    qdf = spark.createDataFrame(
        [(i, qs[i][0], qs[i][1]) for i in qids],
        "q_id int, qv1 array<double>, qv2 array<double>",
    )
    batch = weighted_vector_search_df(
        hybrid_df, [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")], qdf,
        ef=50, limit=10,
    ).collect()
    got = {}
    for r in sorted(batch, key=lambda r: (r["q_id"], r["joint_dist"], r["id"])):
        got.setdefault(r["q_id"], []).append((r["id"], round(r["joint_dist"], 9)))
    for i in qids:
        single = [
            (r["id"], round(r["joint_dist"], 9))
            for r in weighted_vector_search(
                hybrid_df,
                [(1.0, "v1", qs[i][0]), (0.5, "v2", qs[i][1])],
                ef=50, limit=10,
            ).collect()
        ]
        assert got[i] == single, f"q_id {i}"


def test_batch_indexed_candidate_stage(hybrid_df, spark):
    """An IvfIndex on one term routes that term's candidates through
    ivf_search_df; at full probe the result equals the exact stage."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf

    idx = build_ivf(hybrid_df.select("id", "v1"), "v1", nlist=4, seed=42)
    qids = [0, 7]
    qs = {i: q_of(hybrid_df, i) for i in qids}
    qdf = spark.createDataFrame(
        [(i, qs[i][0], qs[i][1]) for i in qids],
        "q_id int, qv1 array<double>, qv2 array<double>",
    )
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]
    with_idx = weighted_vector_search_df(
        hybrid_df, terms, qdf, ef=40, limit=10,
        indexes={"v1": idx}, nprobe=4,  # full probe == exact candidates
    ).collect()
    exact_stage = weighted_vector_search_df(
        hybrid_df, terms, qdf, ef=40, limit=10,
    ).collect()
    key = lambda rows: sorted(
        (r["q_id"], r["id"], round(r["joint_dist"], 9)) for r in rows
    )
    assert key(with_idx) == key(exact_stage)


def test_batch_max_dist_filters_joint(hybrid_df, spark):
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    q1, q2 = q_of(hybrid_df, 3)
    qdf = spark.createDataFrame(
        [(0, q1, q2)], "q_id int, qv1 array<double>, qv2 array<double>"
    )
    full = weighted_vector_search_df(
        hybrid_df, [(1.0, "v1", "qv1"), (1.0, "v2", "qv2")], qdf, ef=30
    ).collect()
    cut = sorted(r["joint_dist"] for r in full)[len(full) // 2]
    filtered = weighted_vector_search_df(
        hybrid_df, [(1.0, "v1", "qv1"), (1.0, "v2", "qv2")], qdf, ef=30,
        max_dist=cut,
    ).collect()
    assert filtered and all(r["joint_dist"] < cut for r in filtered)
    assert {r["id"] for r in filtered} == {
        r["id"] for r in full if r["joint_dist"] < cut
    }


def test_batch_hnsw_candidate_stage_and_column_contract(hybrid_df, spark):
    """An HnswIndex term routes through hnsw_search_df with the
    caller's q_id/id names restored; extra query columns must NOT leak
    into the output (documented return shape)."""
    from lanterndb_spark.operators.hnsw import build_hnsw
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    n = hybrid_df.count()
    hidx = build_hnsw(
        hybrid_df.select("id", "v1"), "v1", id_col="id", m=8,
        ef_construction=64, num_shards=2, seed=42,
    )
    qids = [0, 7]
    qs = {i: q_of(hybrid_df, i) for i in qids}
    qdf = spark.createDataFrame(
        [(i, qs[i][0], qs[i][1], f"note-{i}") for i in qids],
        "q_id int, qv1 array<double>, qv2 array<double>, note string",
    )
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]
    out = weighted_vector_search_df(
        hybrid_df, terms, qdf, ef=n, limit=10, indexes={"v1": hidx},
    )
    assert "note" not in out.columns  # extra query columns must not leak
    rows = out.collect()
    exact = weighted_vector_search_df(
        hybrid_df, terms, qdf.drop("note"), ef=n, limit=10
    ).collect()
    key = lambda rs: sorted(
        (r["q_id"], r["id"], round(r["joint_dist"], 9)) for r in rs
    )
    assert key(rows) == key(exact)  # full-ef graph == exact candidates
    hidx.graphs.unpersist()


def test_batch_hnsw_stage_string_q_ids_match_long(hybrid_df, spark):
    """String-keyed query frames work on the hnsw route (surrogate-key
    wrap) and answer exactly what the long-keyed run answers."""
    from lanterndb_spark.operators.hnsw import build_hnsw
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    hidx = build_hnsw(
        hybrid_df.select("id", "v1"), "v1", id_col="id", m=8,
        ef_construction=32, num_shards=2, seed=1,
    )
    qids = [0, 7]
    qs = {i: q_of(hybrid_df, i) for i in qids}
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]
    sdf = spark.createDataFrame(
        [(f"q-{i}", qs[i][0], qs[i][1]) for i in qids],
        "q_id string, qv1 array<double>, qv2 array<double>",
    )
    ldf = spark.createDataFrame(
        [(i, qs[i][0], qs[i][1]) for i in qids],
        "q_id long, qv1 array<double>, qv2 array<double>",
    )
    got_s = weighted_vector_search_df(
        hybrid_df, terms, sdf, ef=20, limit=10, indexes={"v1": hidx}
    ).collect()
    got_l = weighted_vector_search_df(
        hybrid_df, terms, ldf, ef=20, limit=10, indexes={"v1": hidx}
    ).collect()
    key_s = sorted((r["q_id"], r["id"], round(r["joint_dist"], 9)) for r in got_s)
    key_l = sorted((f"q-{r['q_id']}", r["id"], round(r["joint_dist"], 9)) for r in got_l)
    assert key_s == key_l
    hidx.graphs.unpersist()


def test_batch_qcol_collision_raises(hybrid_df, spark):
    """A query vector column sharing a base column's name would make the
    joint expression ambiguous at the scoring join — rejected up front."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    q1, q2 = q_of(hybrid_df, 0)
    qdf = spark.createDataFrame(
        [(0, q1, q2)], "q_id int, v1 array<double>, qv2 array<double>"
    )
    with pytest.raises(ValueError, match="collide"):
        weighted_vector_search_df(
            hybrid_df, [(1.0, "v1", "v1"), (0.5, "v2", "qv2")], qdf, ef=10
        )


def test_index_candidate_stage_forwards_metric(hybrid_df):
    """The single-query candidate stage must rank index-backed candidates
    by the JOINT metric (lantern.sql:769-806 uses the same <op> per
    column): a full-probe ivf term under cos must equal the exact-scan
    candidate path under cos, which differs from l2sq ranking at small
    ef on unnormalized vectors."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search
    from lanterndb_spark.operators.ivf import build_ivf

    idx = build_ivf(hybrid_df.select("id", "v1"), "v1", nlist=4, seed=42)
    q1, _q2 = q_of(hybrid_df, 5)
    terms = [(1.0, "v1", q1)]
    with_idx = weighted_vector_search(
        hybrid_df, terms, metric="cos", ef=8, limit=8, indexes={"v1": idx}
    ).collect()  # default nprobe=4 == nlist → full probe
    exact_stage = weighted_vector_search(
        hybrid_df, terms, metric="cos", ef=8, limit=8
    ).collect()
    key = lambda rows: [(r["id"], round(r["joint_dist"], 9)) for r in rows]
    assert key(with_idx) == key(exact_stage)


def test_hnsw_candidate_stage_rejects_metric_mismatch(hybrid_df):
    """An hnsw graph bakes its metric at build; asking for candidates
    under a different joint metric must raise, not silently rank by the
    graph's distance."""
    from lanterndb_spark.operators.hnsw import build_hnsw
    from lanterndb_spark.operators.hybrid import weighted_vector_search

    hidx = build_hnsw(
        hybrid_df.select("id", "v1"), "v1", id_col="id", m=8,
        ef_construction=32, num_shards=2, seed=1,
    )  # metric defaults to l2sq
    q1, _q2 = q_of(hybrid_df, 0)
    with pytest.raises(ValueError, match="matching graph"):
        weighted_vector_search(
            hybrid_df, [(1.0, "v1", q1)], metric="cos", ef=10,
            indexes={"v1": hidx},
        )
    hidx.graphs.unpersist()


def test_batch_ivf_stage_cache_releasable(hybrid_df, spark):
    """The ivf candidate stage's internal routed-frame cache must ride
    the result's persisted-intermediates attachment so release() frees
    it (attachments don't propagate through transformations)."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf
    from lanterndb_spark.plans.shape import release

    idx = build_ivf(hybrid_df.select("id", "v1"), "v1", nlist=4, seed=42)
    q1, q2 = q_of(hybrid_df, 0)
    qdf = spark.createDataFrame(
        [(0, q1, q2)], "q_id int, qv1 array<double>, qv2 array<double>"
    )
    out = weighted_vector_search_df(
        hybrid_df, [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")], qdf,
        ef=10, limit=5, indexes={"v1": idx}, nprobe=2,
    )
    cached = out.__dict__.get("_lantern_persisted", [])
    assert cached, "ivf stage cache should attach to the hybrid result"
    out.collect()
    assert any(c.storageLevel.useMemory or c.storageLevel.useDisk for c in cached)
    release(out)
    assert all(
        not (c.storageLevel.useMemory or c.storageLevel.useDisk) for c in cached
    )


def test_batch_hnsw_candidate_stage_rejects_metric_mismatch(hybrid_df, spark):
    """The batch form enforces the same graph-metric guard as the
    single-query path: a cos joint over an l2sq-built graph raises
    instead of silently ranking candidates by the wrong distance."""
    from lanterndb_spark.operators.hnsw import build_hnsw
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    hidx = build_hnsw(
        hybrid_df.select("id", "v1"), "v1", id_col="id", m=8,
        ef_construction=32, num_shards=2, seed=1,
    )  # metric defaults to l2sq
    q1, q2 = q_of(hybrid_df, 0)
    qdf = spark.createDataFrame(
        [(0, q1, q2)], "q_id int, qv1 array<double>, qv2 array<double>"
    )
    with pytest.raises(ValueError, match="matching graph"):
        weighted_vector_search_df(
            hybrid_df, [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")], qdf,
            metric="cos", ef=10, indexes={"v1": hidx},
        )
    hidx.graphs.unpersist()


def test_hybrid_batch_duplicate_q_ids_per_row(hybrid_df, spark):
    """Duplicate q_id VALUES answer per ROW on the hybrid batch too
    (r12): same contract as the ANN/bm25 batch surfaces — without the
    wrap the scoring join fans out across duplicates and the joint
    window merges their candidate sets."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    q1a, q2a = q_of(hybrid_df, 0)
    q1b, q2b = q_of(hybrid_df, 9)
    q1c, q2c = q_of(hybrid_df, 17)
    dup = spark.createDataFrame(
        [(7, q1a, q2a), (7, q1b, q2b), (3, q1c, q2c)],
        "q_id long, qv1 array<double>, qv2 array<double>",
    )
    uniq = spark.createDataFrame(
        [(0, q1a, q2a), (1, q1b, q2b), (2, q1c, q2c)],
        "q_id long, qv1 array<double>, qv2 array<double>",
    )
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]
    n = hybrid_df.count()
    got = weighted_vector_search_df(
        hybrid_df, terms, dup, id_col="id", ef=n, limit=5
    ).select("q_id", "id", "joint_dist").collect()
    exp = weighted_vector_search_df(
        hybrid_df, terms, uniq, id_col="id", ef=n, limit=5
    ).select("q_id", "id", "joint_dist").collect()
    remap = {0: 7, 1: 7, 2: 3}
    key = lambda rows, rm=None: sorted(
        ((rm.get(r["q_id"], r["q_id"]) if rm else r["q_id"]),
         r["id"], round(r["joint_dist"], 9)) for r in rows
    )
    assert len(got) == 15  # 3 input rows x limit, not 10
    assert key(got) == key(exp, remap)


def test_hybrid_single_null_q_id_not_dropped(hybrid_df, spark):
    """A single NULL q_id takes the surrogate wrap on the hybrid batch
    (r13 advice): the scoring join keys on q_id and silently drops NULL
    keys, so before the fix a lone NULL-keyed query returned zero rows
    with no error."""
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df

    q1a, q2a = q_of(hybrid_df, 0)
    one_null = spark.createDataFrame(
        [(None, q1a, q2a)],
        "q_id string, qv1 array<double>, qv2 array<double>",
    )
    ref = spark.createDataFrame(
        [("a", q1a, q2a)],
        "q_id string, qv1 array<double>, qv2 array<double>",
    )
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]
    n = hybrid_df.count()
    got = weighted_vector_search_df(
        hybrid_df, terms, one_null, id_col="id", ef=n, limit=5
    ).select("q_id", "id", "joint_dist").collect()
    assert len(got) == 5  # not zero: the wrap carried the row through
    assert all(r["q_id"] is None for r in got)
    exp = weighted_vector_search_df(
        hybrid_df, terms, ref, id_col="id", ef=n, limit=5
    ).select("q_id", "id", "joint_dist").collect()
    assert sorted((r["id"], round(r["joint_dist"], 9)) for r in got) == sorted(
        (r["id"], round(r["joint_dist"], 9)) for r in exp
    )


def test_stage_threads_sequential_matches_overlapped(hybrid_df, spark):
    """r14 contract for the overlapped candidate construction
    (_STAGE_THREADS): threading is a driver-scheduling change ONLY —
    rows must be identical to the sequential order on both the clean
    path and the dirty path (duplicate q_ids, where the overlapped
    build is speculative and discarded)."""
    from lanterndb_spark.operators import hybrid
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf
    from lanterndb_spark.plans.shape import release

    idx = build_ivf(hybrid_df.select("id", "v1"), "v1", nlist=4, seed=42)
    q1a, q2a = q_of(hybrid_df, 0)
    q1b, q2b = q_of(hybrid_df, 9)
    clean = spark.createDataFrame(
        [(0, q1a, q2a), (1, q1b, q2b)],
        "q_id long, qv1 array<double>, qv2 array<double>",
    )
    dirty = spark.createDataFrame(
        [(7, q1a, q2a), (7, q1b, q2b)],
        "q_id long, qv1 array<double>, qv2 array<double>",
    )
    terms = [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")]

    def run(qdf):
        out = weighted_vector_search_df(
            hybrid_df, terms, qdf, id_col="id", ef=10, limit=5,
            indexes={"v1": idx}, nprobe=2,
        )
        rows = sorted(
            (r["q_id"], r["id"], round(r["joint_dist"], 9))
            for r in out.select("q_id", "id", "joint_dist").collect()
        )
        release(out)
        return rows

    saved = hybrid._STAGE_THREADS
    try:
        for qdf in (clean, dirty):
            hybrid._STAGE_THREADS = 0
            seq = run(qdf)
            hybrid._STAGE_THREADS = 8
            thr = run(qdf)
            assert seq == thr and seq
    finally:
        hybrid._STAGE_THREADS = saved
    idx.assigned.unpersist()


def test_speculative_build_discard_frees_caches(hybrid_df, spark):
    """When the concurrent dup-check comes back dirty, the speculative
    per-term builds are discarded — their internal caches (ivf's routed
    frame) must be unpersisted at discard, and the wrap path's own
    caches must ride the result for release(). Asserts on the SPECIFIC
    RDD ids this test creates (set diffs), not global counts (the r13
    flake lesson)."""
    from lanterndb_spark.operators import hybrid
    from lanterndb_spark.operators.hybrid import weighted_vector_search_df
    from lanterndb_spark.operators.ivf import build_ivf
    from lanterndb_spark.plans.shape import release

    def pids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    idx = build_ivf(hybrid_df.select("id", "v1"), "v1", nlist=4, seed=42)
    q1a, q2a = q_of(hybrid_df, 0)
    dirty = spark.createDataFrame(
        [(7, q1a, q2a), (7, q1a, q2a)],
        "q_id long, qv1 array<double>, qv2 array<double>",
    )
    before = pids()
    saved = hybrid._STAGE_THREADS
    try:
        hybrid._STAGE_THREADS = 8
        out = weighted_vector_search_df(
            hybrid_df, [(1.0, "v1", "qv1"), (0.5, "v2", "qv2")], dirty,
            id_col="id", ef=10, limit=5, indexes={"v1": idx}, nprobe=2,
        )
        out.collect()
        release(out)
    finally:
        hybrid._STAGE_THREADS = saved
    created_live = pids() - before
    assert not created_live, (
        f"RDD ids left cached after discard+release: {created_live}"
    )
    idx.assigned.unpersist()
