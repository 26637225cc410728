"""Native host runtime (C++ via ctypes) vs the NumPy fallbacks."""

import numpy as np
import pytest

from efficient_gnns_tpu import native
from efficient_gnns_tpu.graphs import build_graph
from efficient_gnns_tpu.graphs.blocking import build_blocking


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


def test_lexsort_edges(rng):
    n, e = 500, 4000
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    order = native.lexsort_edges(s, r, n)
    ref = np.lexsort((s, r))
    # permutations may differ on ties only if unstable; radix is stable
    np.testing.assert_array_equal(order, ref)


def test_csr_offsets(rng):
    n, e = 100, 700
    rows = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    padded = np.concatenate([rows, np.full(50, n, np.int32)])
    got = native.csr_offsets(padded, n)
    counts = np.bincount(rows, minlength=n)
    ref = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=ref[1:])
    np.testing.assert_array_equal(got, ref)


def test_to_bidirected(rng):
    n, e = 60, 300
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    gs, gr = native.to_bidirected(s, r)
    es = np.concatenate([s, r])
    er = np.concatenate([r, s])
    ref = np.unique(np.stack([es, er], axis=1), axis=0)
    got = np.stack([gs, gr], axis=1)
    np.testing.assert_array_equal(np.unique(got, axis=0), ref)
    assert len(got) == len(ref)


def test_blocking_matches_numpy(rng, monkeypatch):
    n, e = 300, 1200
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_pad_multiple=64)
    sh = np.asarray(g.senders)
    rh = np.asarray(g.receivers)
    # force build_blocking onto its NumPy path for the reference
    from efficient_gnns_tpu.native import host as native_host

    monkeypatch.setattr(native_host, "blocking_arrays", lambda *a, **k: None)
    ref = build_blocking(sh, rh, n, g.num_edges_padded, tm=64, eb=32)
    monkeypatch.undo()
    got = native.blocking_arrays(sh, rh, n, g.num_edges_padded, tm=64, eb=32)
    assert got is not None
    tile_idx, first_flag, edge_id, src, dst_local = got
    np.testing.assert_array_equal(tile_idx, np.asarray(ref.tile_idx))
    np.testing.assert_array_equal(first_flag, np.asarray(ref.first_flag))
    np.testing.assert_array_equal(edge_id, np.asarray(ref.edge_id))
    np.testing.assert_array_equal(src, np.asarray(ref.src))
    np.testing.assert_array_equal(dst_local, np.asarray(ref.dst_local))


def test_random_walks(rng):
    # path graph 0->1->2->...: walks are forced forward
    n = 50
    s = np.arange(n - 1)
    r = np.arange(1, n)
    g = build_graph(s, r, n, edge_pad_multiple=64)
    # out-edge CSR = transpose container arrays (t_row_offsets over t_r=senders)
    offsets = np.asarray(g.t_row_offsets)
    nbrs = np.asarray(g.t_senders)  # transpose senders = original receivers
    roots = np.array([0, 5, 10], dtype=np.int32)
    walks = native.random_walks(offsets, nbrs, roots, walk_length=4, seed=1)
    expect = roots[:, None] + np.arange(5)[None, :]
    np.testing.assert_array_equal(walks, expect)


def test_random_walks_stay_in_graph(rng):
    n, e = 200, 1000
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_pad_multiple=64)
    offsets = np.asarray(g.t_row_offsets)
    nbrs = np.asarray(g.t_senders)
    roots = rng.integers(0, n, size=64).astype(np.int32)
    walks = native.random_walks(offsets, nbrs, roots, walk_length=6, seed=7)
    assert walks.shape == (64, 7)
    assert walks.min() >= 0 and walks.max() < n
    np.testing.assert_array_equal(walks[:, 0], roots)
    # determinism
    walks2 = native.random_walks(offsets, nbrs, roots, walk_length=6, seed=7)
    np.testing.assert_array_equal(walks, walks2)


def test_filter_relabel_edges(rng):
    n, e = 80, 400
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = rng.integers(0, n, size=e).astype(np.int64)
    keep_nodes = rng.choice(n, size=30, replace=False)
    relabel = np.full(n, -1, dtype=np.int64)
    relabel[keep_nodes] = np.arange(30)
    gs, gr = native.filter_relabel_edges(s, r, relabel)
    ks = relabel[s]
    kr = relabel[r]
    mask = (ks >= 0) & (kr >= 0)
    np.testing.assert_array_equal(gs, ks[mask])
    np.testing.assert_array_equal(gr, kr[mask])
