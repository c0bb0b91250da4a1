import pytest
from pyspark.sql import functions as F

from lanterndb_spark.operators.dedup import (
    duplicate_groups,
    embedding_near_dup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
    simhash_pairs,
    word_shingles,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
            (3, "the quick brown fox jumps over the lazy cat"),   # near dup
            (4, "completely different content about spark engines"),
            (5, "spark engines process completely different content"),
        ],
        "doc_id int, text string",
    )


def test_exact_dedup(dup_docs):
    kept = exact_dedup(dup_docs, "text", "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5]
    groups = duplicate_groups(dup_docs, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0]["ids"] == [1, 2]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    rows = [r["s"] for r in df.select(word_shingles("t", 3).alias("s")).collect()]
    assert sorted(rows[0]) == ["a b c", "b c d"]
    assert rows[1] == ["a b"]  # shorter than n -> single joined shingle
    assert rows[2] == []


def test_jaccard_pairs(dup_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(dup_docs, "doc_id", "text", n=3, threshold=0.3).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)   # identical
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert (4, 5) not in pairs  # word order differs -> different 3-grams


def test_minhash_signature_deterministic(dup_docs):
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(dup_docs, "doc_id", "text", 16, 3).collect()}
    assert sigs[1] == sigs[2]           # identical docs, identical signatures
    assert len(sigs[1]) == 16
    again = {r["id"]: r["sig"] for r in minhash_signatures(dup_docs, "doc_id", "text", 16, 3).collect()}
    assert sigs == again


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(
        dup_docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.3).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs
    # verified jaccard must match the exact computation
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.3).collect()}
    for k, v in pairs.items():
        assert v == pytest.approx(exact[k])


def test_minhash_bands_validation(dup_docs):
    with pytest.raises(ValueError):
        minhash_lsh_pairs(dup_docs, "doc_id", "text", num_hashes=10, bands=3)


def test_simhash_properties(dup_docs):
    fps = {r["id"]: r["fp"] for r in simhash_fingerprints(dup_docs, "doc_id", "text").collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[4]
    pairs = simhash_pairs(dup_docs, "doc_id", "text", max_hamming=8).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(1, 2)] == 0
    if (1, 3) in found:
        assert found[(1, 3)] > 0


def test_embedding_near_dup(tables):
    emb = tables["embeddings"].limit(200)
    brute = embedding_near_dup_pairs(emb, "vec_id", "embedding", max_cos_dist=0.4).collect()
    assert all(r["id_a"] < r["id_b"] for r in brute)
    assert all(r["cos_dist"] <= 0.4 for r in brute)
    # LSH path returns a subset of brute pairs (bucketing only prunes)
    lsh = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", max_cos_dist=0.4, method="lsh", n_planes=4
    ).collect()
    brute_keys = {(r["id_a"], r["id_b"]) for r in brute}
    assert {(r["id_a"], r["id_b"]) for r in lsh} <= brute_keys


def test_embedding_near_dup_ann(tables):
    from pyspark.sql import functions as F

    emb = (
        tables["embeddings"].limit(100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    # planted twins: scaling preserves direction, so cos_dist(v, 2v) = 0
    # while the corpus's natural pair floor is ~0.49
    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    corpus = emb.unionByName(twins)
    n = corpus.count()
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    # full probe: every shard's beam is its exact scan, so ann == brute
    ann = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.05, method="ann",
        ef=n, index_params={"num_shards": 4},
    )
    keys = {(r["id_a"], r["id_b"]) for r in ann.collect()}
    assert keys == {(i, i + 100000) for i in ids}
    brute = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.05, method="brute"
    )
    assert keys == {(r["id_a"], r["id_b"]) for r in brute.collect()}
    # default-knob ann (ef=64): exact-precision property holds regardless
    # (every emitted pair carries its REAL rescored cos distance), and
    # the planted twins are each other's nearest neighbor so recall is
    # full here too
    ann_lo = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.05, method="ann",
        k_neighbors=3, index_params={"num_shards": 4},
    )
    lo = ann_lo.collect()
    assert {(r["id_a"], r["id_b"]) for r in lo} == keys
    assert all(r["cos_dist"] <= 0.05 for r in lo)


def test_connected_components_chain_and_islands(spark):
    from lanterndb_spark.operators.dedup import connected_components

    # chain 1-2-3-4, island pair 10-11, singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a bigint, id_b bigint"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_keep_representatives(spark):
    from lanterndb_spark.operators.dedup import dedup_keep_representatives

    df = spark.createDataFrame([(i, f"d{i}") for i in range(8)], "doc_id bigint, t string")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint")
    out = sorted(r["doc_id"] for r in dedup_keep_representatives(df, pairs, "doc_id").collect())
    # groups {1,2,3} -> keep 1; {5,6} -> keep 5; 0,4,7 untouched
    assert out == [0, 1, 4, 5, 7]


def test_minhash_estimate_verify_mode(tables):
    from lanterndb_spark.operators.dedup import minhash_lsh_pairs

    docs = tables["documents"]
    exact = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    est = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, verify="estimate"
        ).collect()
    }
    # estimate mode: same candidates, jaccard estimated from signatures —
    # overlap should be large (both filter at the same threshold)
    inter = len(exact & est)
    assert inter >= 0.7 * max(len(exact), 1)


def test_jaccard_hot_posting_cap(dup_docs):
    # uncapped == huge-cap (no shingle near the cap on this corpus)
    base = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.5,
                               max_posting=None).collect()
    }
    capped_loose = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.5,
                               max_posting=10_000).collect()
    }
    assert capped_loose == base
    # a brutal cap only ever REMOVES pairs (scores can drop, never rise)
    capped_tight = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.5,
                               max_posting=1).collect()
    }
    assert capped_tight <= base


def test_minhash_auto_verify_mode(dup_docs):
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text",
                                   threshold=0.4, verify=True).collect()
    }
    # plenty of headroom → auto picks the exact verify join
    auto_small = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text",
                                   threshold=0.4, verify="auto").collect()
    }
    assert auto_small == exact
    # zero threshold → auto must flip to the estimate mode
    est = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text",
                                   threshold=0.4, verify="estimate").collect()
    }
    auto_forced = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text", threshold=0.4,
                                   verify="auto", auto_estimate_threshold=0).collect()
    }
    assert auto_forced == est


def test_release_unpersists_intermediates(dup_docs):
    from lanterndb_spark.plans.shape import release

    out = jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.5)
    out.collect()
    cached = out.__dict__["_lantern_persisted"]
    assert cached and all(df.storageLevel.useMemory for df in cached)
    release(out)
    assert all(not df.storageLevel.useMemory for df in cached)
    assert "_lantern_persisted" not in out.__dict__


def test_minhash_hot_bucket_cap_star_resolves(spark):
    """A boilerplate blob duplicated far past the bucket cap must (a) emit
    linear star pairs, not the quadratic all-pairs explosion, and (b) still
    resolve to ONE duplicate group through connected components."""
    from lanterndb_spark.operators.dedup import dedup_keep_representatives

    n_copies = 300
    rows = [(i, "boiler plate text repeated everywhere exactly the same way")
            for i in range(n_copies)]
    rows += [(1000 + i, f"unique document number {i} tells its own story {i * 7}")
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=16, bands=4, threshold=0.5,
        max_bucket=50,
    )
    got = pairs.collect()
    # every band bucket of the blob is hot (300 > 50) -> star on min id:
    # exactly n-1 pairs, all (0, j), all verifying at jaccard 1.0
    assert len(got) == n_copies - 1
    assert {(r["id_a"], r["id_b"]) for r in got} == {(0, j) for j in range(1, n_copies)}
    assert all(r["jaccard"] == 1.0 for r in got)
    # and the group resolves: one representative survives, uniques untouched
    kept = dedup_keep_representatives(df, pairs, "doc_id")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {0, 1000, 1001, 1002, 1003, 1004}


def test_minhash_cap_disabled_matches_capped_groups(dup_docs):
    """On small data (no hot buckets) the cap is a no-op."""
    capped = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text",
                                   threshold=0.4, max_bucket=1000).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in minhash_lsh_pairs(dup_docs, "doc_id", "text",
                                   threshold=0.4, max_bucket=None).collect()
    }
    assert capped == uncapped and capped


def test_minhash_incremental_matches_full_run(spark, tables):
    """incremental(old_sigs, new_batch) must equal the estimate-mode full
    run over old+new restricted to pairs touching a new doc (same params,
    max_bucket=None) — band hashes from stored signatures collide exactly
    with band hashes from a fresh build."""
    from lanterndb_spark.operators.dedup import minhash_lsh_incremental

    docs = tables["documents"].select("doc_id", "text").limit(200)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old_sigs = minhash_signatures(old, "doc_id", "text", 32, 3)

    inc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_incremental(
            old_sigs, new, "doc_id", "text",
            num_hashes=32, bands=16, threshold=0.3, max_bucket=None,
        ).collect()
    }
    full = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.3,
        verify="estimate", max_bucket=None,
    )
    new_ids = {r["doc_id"] for r in new.collect()}
    expected = {}
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if a in new_ids or b in new_ids:
            # incremental emits (corpus_id, new_id) for cross pairs and
            # (min,max) for new-new; normalize both to frozenset keys
            expected[frozenset((a, b))] = r["jaccard"]
    got = {frozenset((a, b)): j for (a, b), j in inc.items()}
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k])


def test_minhash_incremental_finds_new_twins(spark, dup_docs):
    """A new doc identical to a corpus doc must surface at jaccard 1.0,
    and a twin WITHIN the new batch must also surface."""
    from lanterndb_spark.operators.dedup import minhash_lsh_incremental

    old_sigs = minhash_signatures(dup_docs, "doc_id", "text", 32, 3)
    new = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog"),  # dup of corpus 1/2
            (102, "totally novel text with no duplicates anywhere"),
            (103, "totally novel text with no duplicates anywhere"),  # dup of 102
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_incremental(
            old_sigs, new, "doc_id", "text", num_hashes=32, bands=16, threshold=0.9
        ).collect()
    }
    assert pairs[(1, 101)] == pytest.approx(1.0)
    assert pairs[(2, 101)] == pytest.approx(1.0)
    assert pairs[(102, 103)] == pytest.approx(1.0)
    # no corpus-corpus pairs leak into the incremental output
    assert all(b >= 101 for (_, b) in pairs)


def test_minhash_incremental_caps_hot_corpus_bucket(spark):
    """A corpus bucket over max_bucket yields at most max_bucket partners
    per new doc (the smallest ids), bounding ingest fan-out."""
    from lanterndb_spark.operators.dedup import minhash_lsh_incremental

    blob = "identical boilerplate text repeated everywhere in the corpus"
    corpus = spark.createDataFrame(
        [(i, blob) for i in range(50)], "doc_id int, text string"
    )
    old_sigs = minhash_signatures(corpus, "doc_id", "text", 32, 3)
    new = spark.createDataFrame([(1000, blob)], "doc_id int, text string")
    pairs = minhash_lsh_incremental(
        old_sigs, new, "doc_id", "text",
        num_hashes=32, bands=16, threshold=0.9, max_bucket=10,
    ).collect()
    partners = sorted(r["id_a"] for r in pairs)
    assert partners == list(range(10))  # the 10 smallest corpus ids


def test_minhash_verify_scope_equivalence(tables):
    """Candidate-scoped exact verification must emit bit-identical pairs
    and jaccards to the default corpus-scoped pass."""
    docs = tables["documents"].select("doc_id", "text").limit(300)
    a = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.3
        ).collect()
    }
    b = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.3,
            verify_scope="candidates",
        ).collect()
    }
    assert a == b and len(a) > 0


def test_choose_bands_scurve_properties():
    from lanterndb_spark.operators.dedup import choose_bands

    b, r = choose_bands(64, 0.5)
    assert b * r == 64
    # the S-curve midpoint (1/b)^(1/r) must sit near the threshold
    mid = (1.0 / b) ** (1.0 / r)
    assert abs(mid - 0.5) < 0.2
    # lower thresholds need more bands (catch lower-J pairs)
    b_lo, _ = choose_bands(64, 0.2)
    b_hi, _ = choose_bands(64, 0.85)
    assert b_lo > b > b_hi
    import pytest as _pytest
    with _pytest.raises(ValueError):
        choose_bands(64, 1.5)


# ------------------------------------------- prefix-filtered exact join

def test_jaccard_prefix_equals_uncapped(dup_docs):
    from lanterndb_spark.operators.dedup import jaccard_pairs_prefix

    for t in (0.3, 0.5, 0.8):
        base = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 6))
            for r in jaccard_pairs(dup_docs, "doc_id", "text", threshold=t,
                                   max_posting=None).collect()
        }
        pref = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 6))
            for r in jaccard_pairs_prefix(dup_docs, "doc_id", "text",
                                          threshold=t).collect()
        }
        assert pref == base, f"threshold {t}"


def test_jaccard_prefix_recall_where_cap_fails(spark):
    """The documented max_posting failure mode: near-dup overlap living in
    HOT shingles. The cap drops the pair; the prefix filter keeps it
    (hot shingles sort to the end of the global order and never enter a
    prefix, but verification still counts them)."""
    from lanterndb_spark.operators.dedup import jaccard_pairs_prefix

    boiler = "terms of service apply to all content on this site"
    rows = [(i, boiler) for i in range(1, 21)]           # 20 boilerplate docs
    rows += [(100, boiler + " unique alpha ending"),
             (101, boiler + " unique alpha finale")]      # near-dup pair
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # every boilerplate 3-gram has posting >= 20; cap at 5 drops them all
    capped = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5,
                               max_posting=5).collect()
    }
    assert (100, 101) not in capped
    pref = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs_prefix(docs, "doc_id", "text",
                                      threshold=0.5).collect()
    }
    assert (100, 101) in pref
    # and it is EXACT: matches the uncapped join pair-for-pair
    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.5,
                               max_posting=None).collect()
    }
    assert {k: round(v, 6) for k, v in pref.items()} == exact


def test_jaccard_prefix_short_and_empty_docs(spark):
    from lanterndb_spark.operators.dedup import jaccard_pairs_prefix

    docs = spark.createDataFrame(
        [(1, "one"), (2, "one"), (3, ""), (4, "totally different words here")],
        "doc_id int, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in jaccard_pairs_prefix(docs, "doc_id", "text",
                                           threshold=0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_containment_pairs_directed(spark):
    from lanterndb_spark.operators.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"           # 4 3-shingles
    long_ = short + " " + " ".join(f"pad{i}" for i in range(30))
    other = "totally different content with no overlap at all here"
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], "doc_id long, text string"
    )
    got = {
        (r["id_sub"], r["id_super"]): r["containment"]
        for r in containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    # every shingle of doc1 appears in doc2 -> containment 1.0 forward only
    assert got == {(1, 2): 1.0}
    # symmetric jaccard misses the same pair at any usable threshold
    j = jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert j == []


def test_containment_both_directions_on_twins(spark):
    t = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    got = {
        (r["id_sub"], r["id_super"]): r["containment"]
        for r in containment_pairs_import(df)
    }
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def containment_pairs_import(df):
    from lanterndb_spark.operators.dedup import containment_pairs

    return containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()


def test_connected_components_durable_checkpoint_fn(spark, tmp_path):
    """Cluster callers can swap localCheckpoint for reliable checkpoint()
    via checkpoint_fn — results identical, truncation goes through the
    hook."""
    from lanterndb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "id_a long, id_b long"
    )
    calls = []
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))

    def durable(df):
        calls.append(1)
        return df.checkpoint(eager=True)

    comp = {r["id"]: r["component"]
            for r in connected_components(pairs, checkpoint_fn=durable).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert len(calls) >= 2  # edges + at least one label round went durable


def test_jaccard_auto_routes_past_crossover(dup_docs, monkeypatch):
    """VERDICT r6 item 5: past JACCARD_PREFIX_CROSSOVER docs,
    jaccard_pairs routes to the recall-lossless prefix plan; exact=True
    pins the inverted-index plan."""
    import lanterndb_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "JACCARD_PREFIX_CROSSOVER", 2)
    calls = {}
    real_prefix = dd.jaccard_pairs_prefix

    def spy(*a, **kw):
        calls["routed"] = True
        return real_prefix(*a, **kw)

    monkeypatch.setattr(dd, "jaccard_pairs_prefix", spy)
    routed = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in dd.jaccard_pairs(dup_docs, "doc_id", "text",
                                  threshold=0.5).collect()
    }
    assert calls.get("routed")
    # routed output == uncapped exact output (recall-lossless)
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in dd.jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.5,
                                  max_posting=None, exact=True).collect()
    }
    assert routed == exact
    # exact=True never routes, even above the crossover
    calls.clear()
    dd.jaccard_pairs(dup_docs, "doc_id", "text", threshold=0.5,
                     exact=True).collect()
    assert "routed" not in calls


def test_embedding_near_dup_auto_routes_to_ann(tables):
    from pyspark.sql import functions as F

    emb = tables["embeddings"].limit(120).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    # force the "large corpus" branch with a tiny limit: auto must take
    # the ann path (not lsh), and with full probe it equals brute
    out = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", max_cos_dist=0.75, method="auto",
        auto_brute_limit=50, ef=n, k_neighbors=20,
        index_params={"num_shards": 2},
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    brute = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", max_cos_dist=0.75, method="brute"
    )
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    # ann is top-k_neighbors per doc: every found pair is true (exact
    # precision), and any miss can only come from the k cut
    assert got <= want
    assert len(want) > 0
    deg = {}
    for a, b in want:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    if max(deg.values()) <= 20:
        assert got == want  # under the k cut, full probe IS exact


def test_embedding_near_dup_reuses_supplied_index(tables, monkeypatch):
    emb = tables["embeddings"]
    """index= skips the per-call graph build entirely (VERDICT r8 item
    4): with build_hnsw poisoned, the supplied-index call still answers
    and matches brute."""
    import lanterndb_spark.operators.hnsw as hnsw_mod
    from lanterndb_spark.operators.hnsw import build_hnsw

    twins = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(twins)
    n = corpus.count()
    idx = build_hnsw(
        corpus, "embedding", id_col="vec_id", metric="cos", m=8,
        ef_construction=64, num_shards=4, seed=42,
    )

    def boom(*a, **k):
        raise AssertionError("index supplied — build_hnsw must not run")

    monkeypatch.setattr(hnsw_mod, "build_hnsw", boom)
    ann = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.05, index=idx, ef=n
    )
    keys = {(r["id_a"], r["id_b"]) for r in ann.collect()}
    monkeypatch.undo()
    brute = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.05, method="brute"
    )
    assert keys == {(r["id_a"], r["id_b"]) for r in brute.collect()}
    idx.graphs.unpersist()


def test_embedding_near_dup_rejects_non_cos_index(tables):
    emb = tables["embeddings"]
    from lanterndb_spark.operators.hnsw import build_hnsw

    idx = build_hnsw(
        emb, "embedding", id_col="vec_id", metric="l2sq", m=8,
        ef_construction=32, num_shards=2, seed=1,
    )
    with pytest.raises(ValueError, match="cos-metric"):
        embedding_near_dup_pairs(emb, "vec_id", "embedding", index=idx)
    idx.graphs.unpersist()


def test_table_semantic_near_dup_routes_through_fresh_index(tables, monkeypatch):
    emb = tables["embeddings"]
    """LanternTable.semantic_near_dup_pairs reuses the table's fresh cos
    hnsw index (zero builds); a tombstone makes it stale and the call
    falls back to the operator's own routing."""
    import lanterndb_spark.operators.hnsw as hnsw_mod
    from lanterndb_spark.table import LanternTable

    t = LanternTable(emb.select("vec_id", "embedding"), "vec_id").create_index(
        "embedding", kind="hnsw", metric="cos", num_shards=2, seed=42
    )
    real_build = hnsw_mod.build_hnsw
    calls = []

    def counting(*a, **k):
        calls.append(1)
        return real_build(*a, **k)

    monkeypatch.setattr(hnsw_mod, "build_hnsw", counting)
    n = emb.count()
    reused = t.semantic_near_dup_pairs("embedding", max_cos_dist=0.4, ef=n)
    got = {(r["id_a"], r["id_b"]) for r in reused.collect()}
    assert calls == []  # fresh index — zero builds
    brute = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", max_cos_dist=0.4, method="brute"
    )
    assert got == {(r["id_a"], r["id_b"]) for r in brute.collect()}
    # staleness guard: a pending tombstone must NOT serve the old graph
    victim = next(iter(got))[0] if got else 0
    t.delete([victim])
    stale = t.semantic_near_dup_pairs("embedding", max_cos_dist=0.4, method="brute")
    stale_keys = {(r["id_a"], r["id_b"]) for r in stale.collect()}
    assert all(victim not in pair for pair in stale_keys)


def test_embedding_near_dup_rescores_lossy_index_exactly(tables):
    """A lossy-quantized (i8) external index emits approximate
    distances; the threshold contract requires an exact rescore, so the
    pair set must still equal brute."""
    emb = tables["embeddings"]
    from lanterndb_spark.operators.hnsw import build_hnsw

    corpus = emb.select("vec_id", "embedding")
    n = corpus.count()
    idx = build_hnsw(
        corpus, "embedding", id_col="vec_id", metric="cos", m=8,
        ef_construction=64, num_shards=2, seed=42, quant="i8",
    )
    ann = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.4, index=idx, ef=n
    ).collect()
    brute = embedding_near_dup_pairs(
        corpus, "vec_id", "embedding", max_cos_dist=0.4, method="brute"
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in ann} == {
        (r["id_a"], r["id_b"]) for r in brute
    }
    # distances are the EXACT cos values, not quantized approximations
    bd = {(r["id_a"], r["id_b"]): r["cos_dist"] for r in brute}
    for r in ann:
        assert r["cos_dist"] == pytest.approx(bd[(r["id_a"], r["id_b"])], abs=1e-9)
    idx.graphs.unpersist()


def test_table_semantic_near_dup_honors_explicit_method(tables, monkeypatch):
    """method='brute' must NOT be silently upgraded to ann by the
    table's fresh-index injection (injection forces method='ann')."""
    emb = tables["embeddings"]
    import lanterndb_spark.operators.dedup as dedup_mod
    from lanterndb_spark.table import LanternTable

    t = LanternTable(emb.select("vec_id", "embedding"), "vec_id").create_index(
        "embedding", kind="hnsw", metric="cos", num_shards=2, seed=42
    )
    seen = {}
    real = dedup_mod.embedding_near_dup_pairs

    def capture(*a, **k):
        seen.update(k)
        return real(*a, **k)

    monkeypatch.setattr(dedup_mod, "embedding_near_dup_pairs", capture)
    t.semantic_near_dup_pairs("embedding", max_cos_dist=0.4, method="brute").collect()
    assert seen.get("index") is None and seen.get("method") == "brute"
    seen.clear()
    t.semantic_near_dup_pairs("embedding", max_cos_dist=0.4).collect()
    assert seen.get("index") is not None  # auto still reuses the index
