"""Row-lockstep kernels == their scalar references.

Round 7 vectorized the commit-phase heuristic selection
(`_dom_select_rows`) and the chunk-end backlink prune (`_prune_rows`)
across whole blocks of rows. Both must keep EXACTLY the sets their
per-row references (`_select_arrays`, `_prune`) keep — the graphs they
build are already pinned end-to-end by hnsw_exact_equiv and the
property suites, but these tests pin the kernels directly so a future
edit can't drift one while the other still passes at the whole-graph
level (ties aside, which measure-zero gaussian data never hits)."""

import numpy as np

from lanterndb_spark.operators import hnsw as H


def _rand_candidates(rng, P, Cmax, d, mm):
    """Distance-sorted candidate blocks with ragged padding, f32 (the
    call sites' dtype)."""
    X = rng.normal(size=(P * Cmax + P, d)).astype(np.float32)
    norms = (X.astype(np.float32) ** 2).sum(1).astype(np.float32)
    SUB = np.zeros((P, Cmax, d), dtype=np.float32)
    SN = np.full((P, Cmax), np.float32(np.inf), dtype=np.float32)
    FD = np.full((P, Cmax), np.float32(np.inf), dtype=np.float32)
    pad = np.ones((P, Cmax), dtype=bool)
    rows_cand = []
    for p in range(P):
        c = int(rng.integers(1, Cmax + 1))
        cand = rng.choice(P * Cmax, size=c, replace=False) + P
        q = X[p]
        dq = (
            norms[cand]
            - 2.0 * (X[cand] @ q).astype(np.float32)
            + norms[p]
        ).astype(np.float32)
        order = np.argsort(dq, kind="stable")
        cand, dq = cand[order], dq[order]
        SUB[p, :c] = X[cand]
        SN[p, :c] = norms[cand]
        FD[p, :c] = dq
        pad[p, :c] = False
        rows_cand.append((cand, dq))
    return X, norms, SUB, SN, FD, pad, rows_cand


def test_dom_select_rows_equals_select_arrays():
    rng = np.random.default_rng(42)
    for trial in range(20):
        P = int(rng.integers(1, 40))
        mm = int(rng.integers(2, 12))
        Cmax = int(rng.integers(2, 4 * mm + 2))
        X, norms, SUB, SN, FD, pad, rows_cand = _rand_candidates(
            rng, P, Cmax, 8, mm
        )
        K, kcnt = H._dom_select_rows(SUB, SN, FD.copy(), pad, mm)
        assert not (K & pad).any()  # never keep padding
        for p, (cand, dq) in enumerate(rows_cand):
            kd, kv = H._select_arrays(
                dq.astype(np.float32), cand, mm, X, norms
            )
            want_ranks = [int(np.where(cand == v)[0][0]) for v in kv]
            got_ranks = np.flatnonzero(K[p]).tolist()
            assert got_ranks == sorted(want_ranks), (
                f"trial {trial} row {p}: lockstep {got_ranks} "
                f"!= scalar {sorted(want_ranks)}"
            )
            assert int(kcnt[p]) == len(kv)


def test_prune_rows_equals_prune():
    rng = np.random.default_rng(7)
    for trial in range(10):
        n = int(rng.integers(40, 120))
        d = 8
        mm = int(rng.integers(3, 9))
        cap = 2 * mm + 1
        X = rng.normal(size=(n, d)).astype(np.float32)
        norms = (X ** 2).sum(1).astype(np.float32)
        arr = np.zeros((n, cap), dtype=np.int32)
        cnt = np.zeros(n, dtype=np.int32)
        over = []
        for i in range(n):
            c = int(rng.integers(0, cap + 1))
            if c:
                nb = rng.choice(n - 1, size=c, replace=False)
                nb[nb >= i] += 1  # no self-loop
                arr[i, :c] = nb
            cnt[i] = c
            if c > mm:
                over.append(i)
        arr2, cnt2 = arr.copy(), cnt.copy()
        for i in over:
            H._prune(i, arr, cnt, mm, X, norms)
        H._prune_rows(np.asarray(over, dtype=np.int64), arr2, cnt2, mm, X, norms)
        assert (cnt == cnt2).all(), f"trial {trial}: kept counts differ"
        for i in range(n):
            a = arr[i, : cnt[i]].tolist()
            b = arr2[i, : cnt2[i]].tolist()
            assert a == b, f"trial {trial} row {i}: {a} != {b}"
