"""Distributed edge-partition SpMM: N-shard result == 1-chip result.

The partition-invariance test the reference can't have (it has no collective
backend at all, SURVEY.md section 2.5) — runs on the virtual 8-device CPU
mesh set up in conftest.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import dense_adj

from efficient_gnns_tpu.graphs import build_graph
from efficient_gnns_tpu import ops
from efficient_gnns_tpu.parallel import make_mesh, shard_rows
from efficient_gnns_tpu.parallel.partition import partition_graph, spmm_sharded


def _graph(rng, n=256, e=1200):
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    w = rng.normal(size=e).astype(np.float32)
    g = build_graph(s, r, n, edge_weight=w, edge_pad_multiple=64)
    return g, (s, r, w)


def test_partition_invariance_forward(rng):
    n = 256
    g, (s, r, w) = _graph(rng, n=n)
    mesh = make_mesh(8)
    part = partition_graph(g, 8)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    xs = shard_rows(mesh, jnp.asarray(x))

    got = np.asarray(spmm_sharded(mesh, part, xs))
    ref = np.asarray(ops.spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_partition_invariance_gradient(rng):
    n = 128
    g, (s, r, w) = _graph(rng, n=n, e=500)
    mesh = make_mesh(8)
    part = partition_graph(g, 8)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    xs = shard_rows(mesh, x)

    def loss_sharded(x_):
        return jnp.sum(jnp.sin(spmm_sharded(mesh, part, x_)))

    def loss_local(x_):
        return jnp.sum(jnp.sin(ops.spmm(g, x_)))

    v1, g1 = jax.value_and_grad(loss_sharded)(xs)
    v2, g2 = jax.value_and_grad(loss_local)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_partition_counts_cover_all_edges(rng):
    n = 256
    g, (s, r, w) = _graph(rng, n=n)
    part = partition_graph(g, 8)
    # every valid edge appears exactly once across shards
    rl = np.asarray(part.receivers_local)
    sd = np.asarray(part.senders)
    valid = rl < part.rows_per_dev
    assert int(valid.sum()) == len(s)
    # reconstruct global receivers and compare multisets
    dev = np.arange(8)[:, None]
    r_global = (rl + dev * part.rows_per_dev)[valid]
    np.testing.assert_array_equal(np.sort(r_global), np.sort(r))
    assert np.all(sd[valid] < n)


# ---------------------------------------------------------------------------
# ring/blockwise Gram & NCE (parallel/ring.py) == single-device criteria
# ---------------------------------------------------------------------------

import pytest

from efficient_gnns_tpu.distill import criteria
from efficient_gnns_tpu.parallel.ring import ring_gsp_term, ring_nce_term


@pytest.mark.parametrize("kernel", ["cosine", "poly", "l2", "rbf"])
def test_ring_gsp_matches_local(rng, kernel):
    n, ds, dt = 64, 12, 20
    f = jnp.asarray(rng.normal(size=(n, ds)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, dt)).astype(np.float32))
    mesh = make_mesh(8)
    got = ring_gsp_term(mesh, f, t, kernel)
    ref = criteria.gsp_term(f, t, kernel, max_samples=n)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)


def test_ring_gsp_gradient(rng):
    n = 32
    f = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    mesh = make_mesh(8)
    g1 = jax.grad(lambda f_: ring_gsp_term(mesh, f_, t, "cosine"))(f)
    g2 = jax.grad(lambda f_: criteria.gsp_term(f_, t, "cosine", max_samples=n))(f)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_ring_nce_matches_local(rng):
    # NCE compares *projected* features — equal dims by construction
    # (reference arxiv_pyg/gnn.py:296-306)
    n, dproj = 64, 16
    f = jnp.asarray(rng.normal(size=(n, dproj)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, dproj)).astype(np.float32))
    mesh = make_mesh(8)
    got = ring_nce_term(mesh, f, t, nce_T=0.075)
    ref = criteria.nce_term(f, t, nce_T=0.075, max_samples=n)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)


def test_ring_nce_gradient(rng):
    n = 32
    f = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    mesh = make_mesh(8)
    g1 = jax.grad(lambda f_: ring_nce_term(mesh, f_, t))(f)
    g2 = jax.grad(lambda f_: criteria.nce_term(f_, t, max_samples=n))(f)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# halo-compressed edge partition (all_to_all boundary exchange)
# ---------------------------------------------------------------------------

from efficient_gnns_tpu.parallel.partition import (
    halo_stats,
    partition_graph_halo,
    spmm_halo,
)


def test_halo_partition_invariance_forward(rng):
    n = 256
    g, (s, r, w) = _graph(rng, n=n)
    mesh = make_mesh(8)
    part = partition_graph_halo(g, 8)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    xs = shard_rows(mesh, jnp.asarray(x))

    got = np.asarray(spmm_halo(mesh, part, xs))
    ref = np.asarray(ops.spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_halo_partition_invariance_gradient(rng):
    n = 256
    g, (s, r, w) = _graph(rng, n=n)
    mesh = make_mesh(8)
    part = partition_graph_halo(g, 8)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    def loss_sharded(x_):
        return jnp.sum(jnp.sin(spmm_halo(mesh, part, x_)))

    def loss_single(x_):
        return jnp.sum(jnp.sin(ops.spmm(g, x_)))

    gs = np.asarray(jax.grad(loss_sharded)(shard_rows(mesh, jnp.asarray(x))))
    g1 = np.asarray(jax.grad(loss_single)(jnp.asarray(x)))
    np.testing.assert_allclose(gs, g1, rtol=1e-4, atol=1e-4)


def test_halo_partition_covers_all_edges(rng):
    n = 256
    g, (s, r, w) = _graph(rng, n=n)
    part = partition_graph_halo(g, 8)
    rows = part.rows_per_dev
    rl = np.asarray(part.r_local)
    rh = np.asarray(part.r_halo)
    n_edges = int((rl < rows).sum() + (rh < rows).sum())
    assert n_edges == len(s)
    stats = halo_stats(part)
    assert stats["halo_rows_per_device"] <= stats["all_gather_rows_per_device"]


def test_partition_folds_factored_node_scale(rng):
    """Edge-partitioned SpMM over a gcn_norm='factored' graph folds the
    diagonal scales into the partition weights: partitioned == full spmm."""
    import jax
    from jax.sharding import Mesh

    from efficient_gnns_tpu.graphs import build_graph
    from efficient_gnns_tpu import ops
    from efficient_gnns_tpu.parallel.partition import (
        partition_graph,
        spmm_sharded,
    )

    n, e = 64, 300
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, bidirected=True, self_loops=True,
                    gcn_norm="factored", edge_pad_multiple=64)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    want = np.asarray(ops.spmm(g, x))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    part = partition_graph(g, 8)
    with mesh:
        got = np.asarray(jax.jit(lambda x: spmm_sharded(mesh, part, x))(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_halo_two_level_mesh_invariance(rng):
    """DCN x ICI decomposition (spmm_halo_2level): all_to_all within the
    chip axis + ppermute ring across the host axis on a (2, 4) (host, chip)
    mesh == the single-device SpMM, forward and gradient (VERDICT r4 item 9;
    closest testable approximation of the multi-host pod topology)."""
    from efficient_gnns_tpu.parallel.partition import (
        partition_graph_halo,
        spmm_halo_2level,
    )

    n = 256
    g, (s, r, w) = _graph(rng, n=n)
    mesh = make_mesh(8, axes=("host", "chip"), shape=(2, 4))
    part = partition_graph_halo(g, 8)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    got = np.asarray(spmm_halo_2level(mesh, part, jnp.asarray(x)))
    ref = np.asarray(ops.spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def loss_2lvl(x_):
        return jnp.sum(jnp.sin(spmm_halo_2level(mesh, part, x_)))

    def loss_single(x_):
        return jnp.sum(jnp.sin(ops.spmm(g, x_)))

    g2 = np.asarray(jax.grad(loss_2lvl)(jnp.asarray(x)))
    g1 = np.asarray(jax.grad(loss_single)(jnp.asarray(x)))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-4)

    # also on a 4x2 factorization (host-majority flipped)
    mesh42 = make_mesh(8, axes=("host", "chip"), shape=(4, 2))
    got42 = np.asarray(spmm_halo_2level(mesh42, part, jnp.asarray(x)))
    np.testing.assert_allclose(got42, ref, rtol=1e-4, atol=1e-4)
