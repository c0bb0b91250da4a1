"""Worker-side graph-blob cache (hnsw.py `_graph_from_blob_cached`).

Blobs are immutable per generation: `to_blob` stamps a 16-byte random
uid header, untouched shards pass through hnsw_insert/compact as
verbatim bytes (uid preserved), and touched shards re-serialize (new
uid). The per-worker LRU keys on that uid, so repeat searches —
autotune grids, target_recall selection, filtered-search escalation
rounds — skip re-deserializing multi-MB blobs, invalidation-free.
Measured (tools/cache_probe.py, 200k x 64, 16 shards, 20 x 10-query
rounds): 1894 -> 1039 ms/round = 1.82x.
Mirrors the reference's buffer-cache economics (the Postgres side keeps
hot index pages pinned across scans; scan.c re-reads pages, not files).
"""

import numpy as np
import pytest

from lanterndb_spark.operators import hnsw as H


def _mk(n=300, d=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    return H._Graph(ids, X, 8, 32, seed), X


def _clear():
    H._GRAPH_CACHE.clear()
    H._GRAPH_CACHE_BYTES = 0


def test_blob_header_roundtrip_and_uid_freshness():
    g, X = _mk()
    b1, b2 = g.to_blob(), g.to_blob()
    assert b1[:4] == H._BLOB_MAGIC and b2[:4] == H._BLOB_MAGIC
    # same graph, two serializations -> two generation uids
    assert b1[4:H._BLOB_HDR] != b2[4:H._BLOB_HDR]
    q = X[5]
    want = g.search(q, 10, 32)
    got = H._Graph.from_blob(b1).search(q, 10, 32)
    assert list(want[0]) == list(got[0])
    # f32 blob storage: roundtrip distances re-derive from f32-cast rows
    np.testing.assert_allclose(want[1], got[1], atol=1e-6)


def test_legacy_headerless_blob_loads_and_is_not_cached():
    _clear()
    g, X = _mk()
    legacy = bytes(g.to_blob()[H._BLOB_HDR:])  # raw pickle, pre-header format
    q = X[7]
    want = g.search(q, 10, 32)
    g1 = H._graph_from_blob_cached(legacy)
    g2 = H._graph_from_blob_cached(legacy)
    assert g1 is not g2  # no uid -> no cache entry
    assert len(H._GRAPH_CACHE) == 0
    got = g1.search(q, 10, 32)
    assert list(want[0]) == list(got[0])


def test_cache_hit_same_object_same_results():
    _clear()
    g, X = _mk()
    b = g.to_blob()
    g1 = H._graph_from_blob_cached(b)
    g2 = H._graph_from_blob_cached(b)
    assert g1 is g2
    assert len(H._GRAPH_CACHE) == 1
    q = X[3]
    want = H._Graph.from_blob(b).search(q, 10, 32)
    r1 = g1.search(q, 10, 32)
    r2 = g2.search(q, 10, 32)  # second search on the SAME cached object
    assert list(r1[0]) == list(want[0]) == list(r2[0])
    np.testing.assert_allclose(r1[1], want[1])
    np.testing.assert_allclose(r2[1], want[1])


def test_skip_ids_are_not_sticky_on_cached_graph():
    _clear()
    g, X = _mk()
    b = g.to_blob()
    q = X[11]
    base_ids = list(H._Graph.from_blob(b).search(q, 10, 32)[0])
    cached = H._graph_from_blob_cached(b)
    skipped, _ = cached.search(q, 10, 32, skip_ids=frozenset(base_ids[:3]))
    assert not set(base_ids[:3]) & set(skipped)
    again, _ = H._graph_from_blob_cached(b).search(q, 10, 32)
    assert list(again) == base_ids  # skip set did not leak into the cache


def test_mutation_paths_get_fresh_uids():
    _clear()
    g, X = _mk()
    b = g.to_blob()
    cached = H._graph_from_blob_cached(b)
    # insert path: fresh from_blob (never the cache), add, re-serialize
    fresh = H._Graph.from_blob(b)
    rng = np.random.default_rng(9)
    fresh.add(np.arange(1000, 1016, dtype=np.int64),
              rng.normal(size=(16, X.shape[1])), 9)
    b2 = fresh.to_blob()
    assert b2[4:H._BLOB_HDR] != b[4:H._BLOB_HDR]
    g2 = H._graph_from_blob_cached(b2)
    assert g2 is not cached
    assert len(g2.ids) == len(cached.ids) + 16
    # the old generation's entry still answers with the old rows
    assert len(H._graph_from_blob_cached(b).ids) == len(X)


def test_budget_eviction_lru(monkeypatch):
    _clear()
    g, _ = _mk(n=200)
    blobs = [g.to_blob() for _ in range(4)]
    one = H._graph_mem(H._Graph.from_blob(blobs[0]))
    monkeypatch.setattr(H, "_GRAPH_CACHE_BUDGET", int(one * 2.5))
    for b in blobs[:3]:
        H._graph_from_blob_cached(b)
    assert len(H._GRAPH_CACHE) == 2  # third insert evicted the oldest
    assert H._GRAPH_CACHE_BYTES <= H._GRAPH_CACHE_BUDGET
    assert bytes(blobs[0][4:H._BLOB_HDR]) not in H._GRAPH_CACHE
    # touch #1 (now oldest-but-one), insert #3 -> #2 evicted, #1 kept
    H._graph_from_blob_cached(blobs[1])
    H._graph_from_blob_cached(blobs[3])
    assert bytes(blobs[1][4:H._BLOB_HDR]) in H._GRAPH_CACHE
    assert bytes(blobs[2][4:H._BLOB_HDR]) not in H._GRAPH_CACHE
    _clear()


def test_oversized_graph_bypasses_cache(monkeypatch):
    _clear()
    g, _ = _mk(n=100)
    b = g.to_blob()
    monkeypatch.setattr(H, "_GRAPH_CACHE_BUDGET", 10)  # smaller than any graph
    g1 = H._graph_from_blob_cached(b)
    g2 = H._graph_from_blob_cached(b)
    assert g1 is not g2
    assert len(H._GRAPH_CACHE) == 0 and H._GRAPH_CACHE_BYTES == 0


def test_quantized_blobs_cache_too():
    _clear()
    for quant in ("f16", "i8", "b1"):
        g, X = _mk(n=150, d=64, seed=3)
        if quant == "b1":
            Xb = (np.random.default_rng(1).normal(size=(150, 64)) > 0)
            g = H._Graph(np.arange(150, dtype=np.int64),
                         Xb.astype(np.float64), 8, 32, 3)
        g.quant = quant
        b = g.to_blob()
        assert H._graph_from_blob_cached(b) is H._graph_from_blob_cached(b)
    _clear()
