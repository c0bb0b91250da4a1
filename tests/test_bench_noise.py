"""bench.py noise-telemetry unit tests (no Spark session needed):
the two-tier per-query swing flag must self-adjudicate phantom deltas
(VERDICT r5 'What's wrong' 2) without flagging explained regressions."""

import sys

sys.path.insert(0, "/root/repo")

import bench


def test_two_x_always_flags():
    got = bench._swing_suspects(
        {"q_ivf": 2.1}, {"q_ivf": 1.0}, touched=set()
    )
    assert len(got) == 1 and "2x" in got[0]


def test_phantom_tier_flags_untouched_module():
    # 1.88x (the r5 q_ivf reading that slid under the 2x flag) with no
    # ivf/pq/autotune commit -> phantom
    got = bench._swing_suspects(
        {"q_ivf": 1.88}, {"q_ivf": 1.0},
        touched={"lanterndb_spark/operators/hnsw.py"},
    )
    assert len(got) == 1 and "phantom" in got[0]


def test_touched_module_suppresses_phantom_tier():
    got = bench._swing_suspects(
        {"q_ivf": 1.88}, {"q_ivf": 1.0},
        touched={"lanterndb_spark/operators/ivf.py"},
    )
    assert got == []


def test_shared_module_counts_as_touched():
    got = bench._swing_suspects(
        {"q_ivf": 1.88}, {"q_ivf": 1.0},
        touched={"lanterndb_spark/session.py"},
    )
    assert got == []


def test_no_git_means_only_two_x_tier():
    got = bench._swing_suspects({"q_ivf": 1.88}, {"q_ivf": 1.0}, None)
    assert got == []
    got2 = bench._swing_suspects({"q_ivf": 2.5}, {"q_ivf": 1.0}, None)
    assert len(got2) == 1


def test_small_bases_never_flag():
    got = bench._swing_suspects({"q_knn": 0.3}, {"q_knn": 0.1}, set())
    assert got == []


def test_touched_since_round_sees_worktree():
    t = bench._touched_since_round("/root/repo")
    assert t is None or isinstance(t, set)


def test_every_bench_query_has_module_mapping():
    # the static map must cover the bench suite so the phantom tier
    # can classify every query (q_tpch_q1 maps to [] on purpose)
    for q in (
        "q_knn q_hybrid q_bm25_build q_bm25 q_pq q_ivf q_minhash "
        "q_knn_join q_sessionize q_asof q_para q_tpch_q1 q_curate "
        "q_decontam q_pii_pack"
    ).split():
        assert q in bench._QUERY_MODULES
