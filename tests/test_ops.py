"""Unit tests: sparse ops vs dense reference math on random small graphs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import dense_adj, random_graph

from efficient_gnns_tpu.graphs import build_graph, gcn_norm_weights
from efficient_gnns_tpu import ops


def test_graph_build_sorted_and_padded(rng):
    g, (s, r) = random_graph(rng, 20, 60)
    recv = np.asarray(g.receivers)
    assert recv.shape[0] == 64  # padded to multiple of 16
    assert np.all(np.diff(recv) >= 0)  # receiver-sorted incl. padding
    assert np.all(recv[60:] == 20)  # padding sentinel
    assert int(g.n_edge) == 60
    # transpose arrays sorted by t_receivers
    tr = np.asarray(g.t_receivers)
    assert np.all(np.diff(tr) >= 0)
    # csc_perm consistency: t_receivers == senders[csc_perm]
    perm = np.asarray(g.csc_perm)
    assert np.array_equal(tr, np.asarray(g.senders)[perm])
    assert np.array_equal(np.asarray(g.t_senders), np.asarray(g.receivers)[perm])
    # CSR offsets count in-degrees
    off = np.asarray(g.row_offsets)
    deg = np.bincount(r, minlength=20)
    assert np.array_equal(off[1:] - off[:-1], deg)


def test_segment_sum_drops_out_of_range():
    data = jnp.ones((4, 3))
    ids = jnp.array([0, 1, 5, 9])  # 5 and 9 out of range for num_segments=2
    out = ops.segment_sum(data, ids, 2)
    np.testing.assert_allclose(np.asarray(out), [[1, 1, 1], [1, 1, 1]])


def test_spmm_matches_dense(rng):
    n, e, f = 23, 71, 5
    g, (s, r) = random_graph(rng, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)
    a = dense_adj(s, r, n)
    got = ops.spmm(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), a @ x, rtol=1e-4, atol=1e-4)


def test_spmm_weighted_and_transpose(rng):
    n, e, f = 17, 50, 4
    w = rng.normal(size=e).astype(np.float32)
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_weight=w, edge_pad_multiple=16)
    x = rng.normal(size=(n, f)).astype(np.float32)
    a = dense_adj(s, r, n, w.astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(ops.spmm(g, jnp.asarray(x))), a @ x, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ops.spmm(g, jnp.asarray(x), transpose=True)),
        a.T @ x,
        rtol=1e-4,
        atol=1e-4,
    )


def test_spmm_mean_matches_dense(rng):
    n, e, f = 19, 55, 3
    g, (s, r) = random_graph(rng, n, e)
    x = rng.normal(size=(n, f)).astype(np.float32)
    a = dense_adj(s, r, n)
    deg = np.maximum(a.sum(axis=1, keepdims=True), 1.0)
    np.testing.assert_allclose(
        np.asarray(ops.spmm_mean(g, jnp.asarray(x))), a @ x / deg, rtol=1e-4, atol=1e-4
    )


def test_spmm_grads_match_dense(rng):
    n, e, f = 11, 30, 3
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_pad_multiple=16)
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=g.num_edges_padded).astype(np.float32)

    def loss_ours(x_, w_):
        y = ops.spmm(g, x_, edge_weight=w_)
        return jnp.sum(jnp.sin(y))

    def loss_dense(x_, w_):
        a = jnp.zeros((n, n)).at[g.receivers[:e], g.senders[:e]].add(w_[:e])
        return jnp.sum(jnp.sin(a @ x_))

    gx, gw = jax.grad(loss_ours, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    gx_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_d), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gw[:e]), np.asarray(gw_d[:e]), rtol=1e-4, atol=1e-4
    )
    assert np.all(np.asarray(gw[e:]) == 0)


def test_sddmm_add_and_dot(rng):
    n, e, h = 13, 40, 2
    g, (s, r) = random_graph(rng, n, e)
    el = rng.normal(size=(n, h)).astype(np.float32)
    er = rng.normal(size=(n, h)).astype(np.float32)
    out = np.asarray(ops.sddmm_add(g, jnp.asarray(el), jnp.asarray(er)))
    ss = np.asarray(g.senders)[:e]
    rr = np.asarray(g.receivers)[:e]
    np.testing.assert_allclose(out[:e], el[ss] + er[rr], rtol=1e-5)

    a = rng.normal(size=(n, 4)).astype(np.float32)
    b = rng.normal(size=(n, 4)).astype(np.float32)
    dot = np.asarray(ops.sddmm_dot(g, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(dot[:e], np.sum(a[rr] * b[ss], -1), rtol=1e-4, atol=1e-5)
    assert np.all(dot[e:] == 0)


def test_sddmm_add_grad(rng):
    n, e = 9, 25
    g, (s, r) = random_graph(rng, n, e)
    el = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    mask = jnp.asarray(np.asarray(g.edge_mask))

    def f(el_, er_):
        out = ops.sddmm_add(g, el_, er_)
        return jnp.sum(jnp.where(mask[:, None], out, 0.0) ** 2)

    def f_ref(el_, er_):
        ss = g.senders
        rr = jnp.minimum(g.receivers, n - 1)
        out = el_[jnp.minimum(ss, n - 1)] + er_[rr]
        return jnp.sum(jnp.where(mask[:, None], out, 0.0) ** 2)

    g1 = jax.grad(f, argnums=(0, 1))(el, er)
    g2 = jax.grad(f_ref, argnums=(0, 1))(el, er)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_edge_softmax_matches_dense(rng):
    n, e = 15, 45
    g, (s, r) = random_graph(rng, n, e)
    logits = rng.normal(size=g.num_edges_padded).astype(np.float32)
    p = np.asarray(ops.edge_softmax(g, jnp.asarray(logits)))
    rr = np.asarray(g.receivers)[:e]
    # per-receiver sums are 1 where the node has in-edges
    sums = np.zeros(n)
    np.add.at(sums, rr, p[:e])
    has_in = np.isin(np.arange(n), rr)
    np.testing.assert_allclose(sums[has_in], 1.0, rtol=1e-5)
    assert np.all(p[e:] == 0)
    # matches manual softmax per group
    for node in np.unique(rr):
        idx = np.where(rr == node)[0]
        ref = np.exp(logits[idx] - logits[idx].max())
        ref /= ref.sum()
        np.testing.assert_allclose(p[idx], ref, rtol=1e-5)


def test_edge_softmax_subset_mask(rng):
    n, e = 10, 30
    g, (s, r) = random_graph(rng, n, e)
    logits = jnp.asarray(rng.normal(size=g.num_edges_padded).astype(np.float32))
    keep = np.zeros(g.num_edges_padded, dtype=bool)
    keep[: e // 2] = True
    p = np.asarray(ops.edge_softmax(g, logits, keep_mask=jnp.asarray(keep)))
    assert np.all(p[~keep] == 0)
    rr = np.asarray(g.receivers)
    sums = np.zeros(n + 1)
    np.add.at(sums, np.minimum(rr, n), p)
    kept_nodes = np.unique(rr[keep])
    np.testing.assert_allclose(sums[kept_nodes], 1.0, rtol=1e-5)


def test_edge_softmax_grad_matches_autodiff(rng):
    n, e = 8, 20
    g, (s, r) = random_graph(rng, n, e)
    logits = jnp.asarray(rng.normal(size=(g.num_edges_padded, 2)).astype(np.float32))

    def obj(p):
        return jnp.sum(jnp.cos(p) * (jnp.arange(p.shape[0])[:, None] % 3))

    def f(lg):
        return obj(ops.edge_softmax(g, lg))

    def f_ref(lg):
        # same math via plain autodiffable segment ops (no custom VJP)
        from efficient_gnns_tpu.ops.segment import _softmax_fwd

        mask = jnp.broadcast_to(g.edge_mask[:, None], lg.shape)
        return obj(_softmax_fwd(lg, g.receivers, g.num_nodes, mask))

    grad = jax.grad(f)(logits)
    grad_ref = jax.grad(f_ref)(logits)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref), rtol=1e-4, atol=1e-5)


def test_gcn_norm_weights(rng):
    n, e = 12, 35
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, bidirected=True, self_loops=True, edge_pad_multiple=16)
    g = gcn_norm_weights(g)
    w = np.asarray(g.edge_weight)
    ne = int(g.n_edge)
    rr = np.asarray(g.receivers)[:ne]
    ss = np.asarray(g.senders)[:ne]
    deg = np.bincount(rr, minlength=n).astype(np.float64)
    expect = 1 / np.sqrt(deg[ss] * deg[rr])
    np.testing.assert_allclose(w[:ne], expect, rtol=1e-5)
    assert np.all(w[ne:] == 0)


def test_gcn_norm_host_path_matches(rng):
    """build_graph(gcn_norm=True) == gcn_norm_weights(build_graph(...)),
    including the pre-blocked weight layouts (w_blk on both blockings)."""
    n, e = 50, 180
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    kw = dict(bidirected=True, self_loops=True, edge_pad_multiple=16,
              block=True, block_tm=16, block_eb=16, hub_dense=0)
    g_host = build_graph(s, r, n, gcn_norm=True, **kw)
    g_dev = gcn_norm_weights(build_graph(s, r, n, **kw))
    np.testing.assert_allclose(
        np.asarray(g_host.edge_weight), np.asarray(g_dev.edge_weight), rtol=1e-6
    )
    for a, b in ((g_host.blocking, g_dev.blocking),
                 (g_host.t_blocking, g_dev.t_blocking)):
        np.testing.assert_allclose(
            np.asarray(a.w_blk), np.asarray(b.w_blk), rtol=1e-6
        )


def test_graph_transpose_roundtrip(rng):
    g, (s, r) = random_graph(rng, 14, 33)
    x = jnp.asarray(rng.normal(size=(14, 4)).astype(np.float32))
    gt = g.transpose()
    a = dense_adj(s, r, 14)
    np.testing.assert_allclose(np.asarray(ops.spmm(gt, x)), a.T @ x, rtol=1e-4, atol=1e-4)
    gtt = gt.transpose()
    np.testing.assert_allclose(np.asarray(ops.spmm(gtt, x)), a @ x, rtol=1e-4, atol=1e-4)


def test_factored_gcn_norm_matches_weighted(rng):
    """build_graph(gcn_norm="factored") — out = S A S x with unweighted
    structures — equals the per-edge-weighted gcn_norm graph, fwd + grad,
    on both the XLA and the blocked (interpret) paths."""
    from efficient_gnns_tpu.ops import dispatch

    n, e = 60, 300
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    kw = dict(bidirected=True, self_loops=True, edge_pad_multiple=64)
    from efficient_gnns_tpu.graphs import build_graph
    g_w = build_graph(s, r, n, gcn_norm=True, **kw)
    g_f = build_graph(s, r, n, gcn_norm="factored", **kw)
    g_wb = build_graph(s, r, n, gcn_norm=True, block=True, hub_dense=4, **kw)
    g_fb = build_graph(s, r, n, gcn_norm="factored", block=True, hub_dense=4,
                       **kw)
    assert g_f.edge_weight is None and g_f.node_scale is not None
    # factored hub slices stay bf16 multiplicities (the HBM win)
    assert g_fb.hub.unit_values and g_fb.hub.m_src.dtype == jnp.bfloat16
    assert not g_wb.hub.unit_values

    def loss(graph, x, transpose=False):
        return jnp.sum(ops.spmm(graph, x, transpose=transpose) ** 2)

    want, gw = jax.value_and_grad(loss, argnums=1)(g_w, x)
    got, gf = jax.value_and_grad(loss, argnums=1)(g_f, x)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gw),
                               rtol=1e-4, atol=1e-5)
    # transpose path (the SpMM backward uses it)
    np.testing.assert_allclose(
        np.asarray(ops.spmm(g_f, x, transpose=True)),
        np.asarray(ops.spmm(g_w, x, transpose=True)), rtol=1e-4, atol=1e-5)

    dispatch.set_backend("pallas", interpret=True)
    try:
        got_b, gfb = jax.value_and_grad(loss, argnums=1)(g_fb, x)
        np.testing.assert_allclose(float(got_b), float(want), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gfb), np.asarray(gw),
                                   rtol=1e-3, atol=1e-4)
    finally:
        dispatch.set_backend("auto", interpret=False)


def test_factored_norm_refuses_undefined_combinations(rng):
    """ADVICE r4: spmm_mean and runtime-edge_weight spmm on a factored-norm
    graph silently computed neither a mean nor the GCN norm — both now
    raise instead of returning a wrong result."""
    from efficient_gnns_tpu.graphs import build_graph

    n, e = 20, 60
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g_f = build_graph(s, r, n, gcn_norm="factored", bidirected=True,
                      self_loops=True, edge_pad_multiple=64)
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    w = jnp.ones((int(g_f.n_edge),), jnp.float32)
    with pytest.raises(ValueError, match="factored"):
        ops.spmm_mean(g_f, x)
    with pytest.raises(ValueError, match="factored"):
        ops.spmm(g_f, x, edge_weight=w)
