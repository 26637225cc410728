"""Pallas blocked segment-matmul kernel vs the XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import dense_adj

from efficient_gnns_tpu.graphs import build_graph
from efficient_gnns_tpu.graphs.blocking import attach_blocking, build_blocking
from efficient_gnns_tpu import ops
from efficient_gnns_tpu.ops import dispatch


@pytest.fixture(autouse=True)
def _pallas_interpret():
    dispatch.set_backend("pallas", interpret=True)
    yield
    dispatch.set_backend("auto", interpret=False)


def _graph(rng, n=300, e=900, tm=64, eb=32):
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_pad_multiple=64)
    return attach_blocking(g, tm=tm, eb=eb), (s, r)


def test_blocking_structure(rng):
    n, e = 100, 400
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_pad_multiple=64)
    blk = build_blocking(
        np.asarray(g.senders), np.asarray(g.receivers), n,
        g.num_edges_padded, tm=32, eb=16,
    )
    nb = blk.num_blocks
    tile_idx = np.asarray(blk.tile_idx)
    assert np.all(np.diff(tile_idx) >= 0)  # blocks ordered by tile
    first = np.asarray(blk.first_flag)
    # first flag marks tile changes
    expect_first = np.ones(nb, bool)
    expect_first[1:] = tile_idx[1:] != tile_idx[:-1]
    np.testing.assert_array_equal(first.astype(bool), expect_first)
    # every tile appears (empty tiles get a padding block)
    assert set(tile_idx.tolist()) == set(range(blk.num_tiles))
    # each real edge appears exactly once
    eid = np.asarray(blk.edge_id)
    real = eid[eid < g.num_edges_padded]
    # only ids of real (non-padding) edges
    assert np.all(np.asarray(g.receivers)[real] < n)
    assert len(np.unique(real)) == e
    # dst_local consistent with receivers
    dst_local = np.asarray(blk.dst_local).reshape(-1)
    has = dst_local < 32
    recv = np.asarray(g.receivers)[eid[has]]
    np.testing.assert_array_equal(recv, tile_idx.repeat(16)[has] * 32 + dst_local[has])


def test_blocked_spmm_matches_xla(rng):
    g, (s, r) = _graph(rng)
    n = 300
    x = jnp.asarray(rng.normal(size=(n, 20)).astype(np.float32))
    a = dense_adj(s, r, n)
    got = ops.spmm(g, x)
    np.testing.assert_allclose(np.asarray(got), a @ np.asarray(x), rtol=1e-4, atol=1e-4)


def test_blocked_spmm_weighted_grads(rng):
    g, (s, r) = _graph(rng, n=120, e=400, tm=32, eb=16)
    n = 120
    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=g.num_edges_padded).astype(np.float32))

    def loss_pallas(x_, w_):
        return jnp.sum(jnp.sin(ops.spmm(g, x_, edge_weight=w_)))

    def loss_xla(x_, w_):
        dispatch.set_backend("xla")
        try:
            return jnp.sum(jnp.sin(ops.spmm(g, x_, edge_weight=w_)))
        finally:
            dispatch.set_backend("pallas", interpret=True)

    v1 = loss_pallas(x, w)
    gx1, gw1 = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    dispatch.set_backend("xla")
    v2 = jnp.sum(jnp.sin(ops.spmm(g, x, edge_weight=w)))
    gx2, gw2 = jax.grad(
        lambda x_, w_: jnp.sum(jnp.sin(ops.spmm(g, x_, edge_weight=w_))),
        argnums=(0, 1),
    )(x, w)
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-5)


def test_blocked_spmm_static_weight_grad(rng):
    # graph.edge_weight path: no weight gradient, dx must still match
    n = 90
    s = rng.integers(0, n, size=300)
    r = rng.integers(0, n, size=300)
    w = rng.normal(size=300).astype(np.float32)
    g = build_graph(s, r, n, edge_weight=w, edge_pad_multiple=64)
    g = attach_blocking(g, tm=32, eb=16)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))

    gx1 = jax.grad(lambda x_: jnp.sum(ops.spmm(g, x_) ** 2))(x)
    dispatch.set_backend("xla")
    gx2 = jax.grad(lambda x_: jnp.sum(ops.spmm(g, x_) ** 2))(x)
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)


def test_blocked_spmm_high_degree_node(rng):
    # one node receives most edges -> many blocks for one tile
    n, e = 64, 600
    s = rng.integers(0, n, size=e)
    r = np.zeros(e, dtype=np.int64)
    r[: e // 3] = rng.integers(0, n, size=e // 3)
    g = build_graph(s, r, n, edge_pad_multiple=64)
    g = attach_blocking(g, tm=32, eb=16)
    x = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    a = dense_adj(s, r, n)
    got = ops.spmm(g, x)
    np.testing.assert_allclose(np.asarray(got), a @ np.asarray(x), rtol=1e-4, atol=1e-3)


def test_choose_eb_minimizes_slots(rng):
    from efficient_gnns_tpu.graphs.blocking import choose_eb

    n = 64
    r = rng.integers(0, n, size=5000)
    eb = choose_eb(r, n, tm=32, candidates=(16, 64, 256))
    # dense tiles (~2500 edges per tile): large blocks amortize step overhead
    assert eb == 256
    # one edge per tile: tiny blocks would add per-step overhead, huge ones
    # waste slots; the model lands in between
    r2 = np.arange(n)
    assert choose_eb(r2, n, tm=32, candidates=(16, 64, 256)) == 64


def test_blocked_sddmm_dw_kernel(rng):
    from efficient_gnns_tpu.ops.pallas import blocked_sddmm_dw
    from efficient_gnns_tpu.ops.segment import gather

    g, (s, r) = _graph(rng, n=96, e=300, tm=32, eb=16)
    blk = g.blocking
    n, f = 96, 128
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    gg = jnp.asarray(rng.normal(size=(blk.num_tiles * 32, f)).astype(np.float32))
    x_blk = gather(x, blk.src)
    dw_blk = np.asarray(blocked_sddmm_dw(gg, x_blk, blk, interpret=True))
    # reference: per-slot <g[dst_global], x[src]>, 0 on padding slots
    dst_local = np.asarray(blk.dst_local).reshape(-1)
    tile = np.asarray(blk.tile_idx).repeat(blk.eb)
    src = np.asarray(blk.src)
    real = dst_local < blk.tm
    ref = np.zeros(blk.num_blocks * blk.eb, np.float32)
    ref[real] = np.sum(
        np.asarray(gg)[tile[real] * blk.tm + dst_local[real]]
        * np.asarray(x)[src[real]],
        axis=-1,
    )
    np.testing.assert_allclose(dw_blk, ref, rtol=1e-4, atol=1e-4)


def test_spmm_weight_grad_false_skips_dw(rng):
    g, (s, r) = _graph(rng, n=80, e=250, tm=32, eb=16)
    x = jnp.asarray(rng.normal(size=(80, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=g.num_edges_padded).astype(np.float32))
    gw = jax.grad(
        lambda w_: jnp.sum(ops.spmm(g, x, edge_weight=w_, weight_grad=False))
    )(w)
    np.testing.assert_array_equal(np.asarray(gw), 0.0)
    # dx still correct vs XLA
    gx1 = jax.grad(
        lambda x_: jnp.sum(ops.spmm(g, x_, edge_weight=w, weight_grad=False) ** 2)
    )(x)
    dispatch.set_backend("xla")
    gx2 = jax.grad(lambda x_: jnp.sum(ops.spmm(g, x_, edge_weight=w) ** 2))(x)
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)


def test_blocked_spmm_heads_matches_xla(rng):
    g, (s, r) = _graph(rng, n=100, e=350, tm=32, eb=16)
    n, h, d = 100, 3, 4
    x = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(g.num_edges_padded, h)).astype(np.float32))

    def loss(x_, w_):
        return jnp.sum(jnp.cos(ops.spmm_heads(g, x_, w_)))

    v1 = loss(x, w)
    g1 = jax.grad(loss, argnums=(0, 1))(x, w)
    dispatch.set_backend("xla")
    v2 = loss(x, w)
    g2 = jax.grad(loss, argnums=(0, 1))(x, w)
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


# ---- hub-dense decomposition (graphs/hub_dense.py) --------------------------


def _hub_graph(rng, n=120, e=800, hub=8, w=None, tm=32, eb=16):
    """Power-law-ish graph built with the hub-dense split enabled."""
    # zipf-ish senders so hubs actually cover edges
    s = (rng.zipf(1.5, size=e) % n).astype(np.int64)
    r = rng.integers(0, n, size=e)
    g = build_graph(
        s, r, n, edge_weight=w, edge_pad_multiple=64,
        block=True, block_tm=tm, block_eb=eb, hub_dense=hub,
    )
    return g, (s, r)


def test_hub_dense_partition_covers_all_edges(rng):
    g, (s, r) = _hub_graph(rng)
    assert g.hub is not None
    n_hub = g.hub.src_eids.shape[0] + g.hub.dst_eids.shape[0]
    blk = g.blocking
    n_res = int(np.sum(np.asarray(blk.dst_local).reshape(-1) < blk.tm))
    assert n_hub + n_res == len(s)
    # dense slices hold edge multiplicities when unweighted (stored bf16 —
    # exact for small integers; accumulate in f32)
    assert float(
        jnp.sum(g.hub.m_src.astype(jnp.float32))
        + jnp.sum(g.hub.m_dst.astype(jnp.float32))
    ) == n_hub
    assert g.hub.unit_values


def test_hub_spmm_matches_dense(rng):
    n, e = 120, 800
    w = rng.normal(size=e).astype(np.float32)
    g, (s, r) = _hub_graph(rng, n=n, e=e, w=w)
    x = rng.normal(size=(n, 5)).astype(np.float32)
    a = dense_adj(s, r, n, w.astype(np.float64))
    got = ops.spmm(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), a @ x, rtol=1e-4, atol=1e-4)
    # transpose path swaps the hub contraction dims
    got_t = ops.spmm(g, jnp.asarray(x), transpose=True)
    np.testing.assert_allclose(np.asarray(got_t), a.T @ x, rtol=1e-4, atol=1e-4)


def test_hub_spmm_unweighted_and_grad(rng):
    n, e = 120, 800
    g, (s, r) = _hub_graph(rng, n=n, e=e)
    a = dense_adj(s, r, n)
    x = rng.normal(size=(n, 5)).astype(np.float32)
    got = ops.spmm(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), a @ x, rtol=1e-4, atol=1e-4)
    gx = jax.grad(lambda x_: jnp.sum(jnp.cos(ops.spmm(g, x_))))(jnp.asarray(x))
    xt = jnp.asarray(x)
    eps = 1e-3
    # directional finite difference
    v = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    f = lambda x_: float(jnp.sum(jnp.cos(ops.spmm(g, x_))))
    num = (f(xt + eps * v) - f(xt - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(gx, v)), num, rtol=1e-2, atol=1e-2)


def test_hub_weights_refresh_via_gcn_norm(rng):
    from efficient_gnns_tpu.graphs import gcn_norm_weights

    n, e = 120, 800
    g, (s, r) = _hub_graph(rng, n=n, e=e)
    g = gcn_norm_weights(g)
    deg = np.maximum(dense_adj(s, r, n).sum(axis=1), 1.0)  # in-degree
    outd = np.maximum(dense_adj(s, r, n).sum(axis=0), 1.0)
    # reference: w_e = d_r^-1/2 d_s^-1/2 over in-degrees of both endpoints
    din = dense_adj(s, r, n).sum(axis=1)
    inv = np.where(din > 0, 1.0 / np.sqrt(np.maximum(din, 1.0)), 0.0)
    a = dense_adj(s, r, n, (inv[r] * inv[s]).astype(np.float64))
    x = rng.normal(size=(n, 4)).astype(np.float32)
    got = ops.spmm(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), a @ x, rtol=1e-4, atol=1e-4)


def test_hub_graph_runtime_weights_fall_back_correctly(rng):
    n, e = 120, 800
    g, (s, r) = _hub_graph(rng, n=n, e=e)
    w = jnp.asarray(rng.normal(size=g.num_edges_padded).astype(np.float32))
    w = jnp.where(g.edge_mask, w, 0.0)
    # w is in the graph's receiver-sorted edge order
    s_srt = np.asarray(g.senders)[: len(s)]
    r_srt = np.asarray(g.receivers)[: len(s)]
    a = dense_adj(s_srt, r_srt, n, np.asarray(w)[: len(s)].astype(np.float64))
    x = rng.normal(size=(n, 4)).astype(np.float32)
    got = ops.spmm(g, jnp.asarray(x), edge_weight=w)
    np.testing.assert_allclose(np.asarray(got), a @ x, rtol=1e-4, atol=1e-4)


def test_blocked_spmm_heads_fallback_matches_fused(rng, monkeypatch):
    # d=20 -> per-head padding to 128; force the pre-scaled fallback via a
    # zero VMEM budget and check fused == fallback == XLA
    g, _ = _graph(rng, n=90, e=400, tm=32, eb=16)
    n, h, d = 90, 2, 20
    x = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(g.num_edges_padded, h)).astype(np.float32))

    def loss(x_, w_):
        return jnp.sum(jnp.cos(ops.spmm_heads(g, x_, w_)))

    v_fused = loss(x, w)
    g_fused = jax.grad(loss, argnums=(0, 1))(x, w)

    import importlib
    spmm_mod = importlib.import_module('efficient_gnns_tpu.ops.spmm')
    monkeypatch.setattr(spmm_mod, "_HEADS_FUSED_VMEM", 0)
    v_fb = loss(x, w)
    g_fb = jax.grad(loss, argnums=(0, 1))(x, w)

    dispatch.set_backend("xla")
    v_xla = loss(x, w)
    g_xla = jax.grad(loss, argnums=(0, 1))(x, w)
    dispatch.set_backend("pallas", interpret=True)

    np.testing.assert_allclose(float(v_fused), float(v_xla), rtol=1e-5)
    np.testing.assert_allclose(float(v_fb), float(v_xla), rtol=1e-5)
    for a, b, c in zip(g_fused, g_fb, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5)


def test_blocking_inv_perm_roundtrip(rng):
    g, _ = _graph(rng, n=80, e=300, tm=32, eb=16)
    for blk in (g.blocking, g.t_blocking):
        inv = np.asarray(blk.inv_perm)
        mapping = np.asarray(
            blk.csr_perm if blk.csr_perm is not None else blk.edge_id
        )
        dst = np.asarray(blk.dst_local).reshape(-1)
        real = dst < blk.tm
        # every real CSR edge round-trips: mapping[inv[csr]] == csr
        csr_ids = mapping[real]
        assert np.array_equal(mapping[inv[csr_ids]], csr_ids)
        # padded CSR ids land on padding slots (zero kernel output)
        e_real = csr_ids.max() + 1 if csr_ids.size else 0
        pad_ids = np.arange(e_real, g.num_edges_padded)
        if pad_ids.size and (~real).any():
            assert np.all(dst[inv[pad_ids]] == blk.tm)


def test_thin_segment_kernels_match_numpy(rng):
    from efficient_gnns_tpu.ops.pallas import (
        blocked_segment_max_thin,
        blocked_segment_sum_thin,
    )

    g, (s, r) = _graph(rng, n=70, e=320, tm=32, eb=16)
    blk = g.blocking
    h = 3
    e_pad = g.num_edges_padded
    vals_csr = rng.normal(size=(e_pad, h)).astype(np.float32)
    mapping = np.asarray(
        blk.csr_perm if blk.csr_perm is not None else blk.edge_id
    )
    v_blk = jnp.asarray(vals_csr)[np.minimum(mapping, e_pad - 1)]

    got_sum = np.asarray(blocked_segment_sum_thin(v_blk, blk, 70, interpret=True))
    got_max = np.asarray(blocked_segment_max_thin(v_blk, blk, 70, interpret=True))

    rr = np.asarray(g.receivers)
    valid = rr < 70
    ref_sum = np.zeros((70, h), np.float32)
    ref_max = np.full((70, h), np.finfo(np.float32).min, np.float32)
    np.add.at(ref_sum, rr[valid], vals_csr[valid])
    np.maximum.at(ref_max, rr[valid], vals_csr[valid])
    np.testing.assert_allclose(got_sum, ref_sum, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got_max, ref_max)


def test_tile_rows_thin_matches_numpy(rng):
    from efficient_gnns_tpu.ops.pallas import tile_rows_thin

    g, (s, r) = _graph(rng, n=70, e=320, tm=32, eb=16)
    blk = g.blocking
    h = 3
    ntm = blk.num_tiles * blk.tm
    vals = rng.normal(size=(ntm, h)).astype(np.float32)
    got = np.asarray(tile_rows_thin(jnp.asarray(vals), blk, interpret=True))

    tm = blk.tm
    tile = np.repeat(np.asarray(blk.tile_idx), blk.eb)
    dst_local = np.asarray(blk.dst_local).reshape(-1)
    real = dst_local < tm
    ref = np.zeros((blk.num_blocks * blk.eb, h), np.float32)
    ref[real] = vals[tile[real] * tm + dst_local[real]]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def _attention_setup(rng, n=70, e=320, h=3, d=5, tm=32, eb=16):
    g, _ = _graph(rng, n=n, e=e, tm=tm, eb=eb)
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    return g, feat, el, er


def _attention_xla(g, feat, el, er, slope=0.2, keep_csr=None):
    if er is not None:
        e = ops.sddmm_add(g, el, er)
    else:
        e = ops.gather(el, g.senders)
    e = jax.nn.leaky_relu(e, slope)
    a = ops.edge_softmax(g, e, keep_mask=keep_csr)
    return ops.spmm_heads(g, feat, a)


@pytest.mark.parametrize("use_er", [True, False])
def test_fused_attention_matches_xla(rng, use_er):
    from efficient_gnns_tpu.ops.attention import gat_attention

    g, feat, el, er = _attention_setup(rng)
    if not use_er:
        er = None
    out = gat_attention(g, feat, el, er)

    dispatch.set_backend("xla")
    ref = _attention_xla(g, feat, el, er)
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("use_er", [True, False])
def test_fused_attention_grads_match_xla(rng, use_er):
    from efficient_gnns_tpu.ops.attention import gat_attention

    g, feat, el, er = _attention_setup(rng)
    if not use_er:
        er = None

    def loss_fused(feat_, el_, er_):
        return jnp.sum(gat_attention(g, feat_, el_, er_) ** 2)

    def loss_xla(feat_, el_, er_):
        dispatch.set_backend("xla")
        try:
            return jnp.sum(_attention_xla(g, feat_, el_, er_) ** 2)
        finally:
            dispatch.set_backend("pallas", interpret=True)

    argnums = (0, 1, 2) if use_er else (0, 1)
    gf = jax.grad(loss_fused, argnums=argnums)(feat, el, er)
    gx = jax.grad(loss_xla, argnums=argnums)(feat, el, er)
    for a, b, name in zip(gf, gx, ["dfeat", "del", "der"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=name
        )


def test_fused_attention_keep_mask_matches_xla(rng):
    """Edge-drop: masked edges are excluded from normalization entirely."""
    from efficient_gnns_tpu.ops.attention import gat_attention

    g, feat, el, er = _attention_setup(rng)
    blk = g.blocking
    e_pad = g.num_edges_padded
    keep_csr = rng.random(e_pad) < 0.7

    # same kept-edge set expressed in blocked slot order
    mapping = np.asarray(
        blk.csr_perm if blk.csr_perm is not None else blk.edge_id
    )
    keep_blk = keep_csr[np.minimum(mapping, e_pad - 1)]
    keep_blk &= np.asarray(blk.dst_local).reshape(-1) < blk.tm

    out = gat_attention(g, feat, el, er, keep_mask=jnp.asarray(keep_blk))
    dispatch.set_backend("xla")
    ref = _attention_xla(g, feat, el, er, keep_csr=jnp.asarray(keep_csr))
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_dgl_gat_conv_fused_matches_xla_path(rng):
    """DGLGATConv picks the fused kernel when blockings exist; eval-mode
    outputs must match the XLA formulation bit-for-tolerance."""
    from efficient_gnns_tpu.models.layers import DGLGATConv

    g, _ = _graph(rng, n=60, e=240, tm=32, eb=16)
    x = jnp.asarray(rng.normal(size=(60, 7)).astype(np.float32))
    layer = DGLGATConv(out_feats=5, num_heads=2, use_attn_dst=True,
                       use_symmetric_norm=True, residual=True)
    variables = layer.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        g, x,
    )
    out_fused = layer.apply(variables, g, x)
    dispatch.set_backend("xla")
    out_xla = layer.apply(variables, g, x)
    dispatch.set_backend("pallas", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), rtol=2e-4, atol=2e-5
    )


def test_blocking_max_dst_row_skips_trailing_tiles(rng):
    """build_blocking(max_dst_row=k): rows < k of the scatter match the
    full blocking exactly (fwd + the static-weight VJP), while the trailing
    tiles carry no blocks — the tall typed R-GCN layout contract
    (models/layers.py RGCNConv typed path slices [:k])."""
    import jax

    from efficient_gnns_tpu.graphs import build_graph
    from efficient_gnns_tpu.ops import dispatch, spmm

    n_tall, k, e = 1024, 192, 500
    s = rng.integers(0, n_tall, size=e)   # senders over the full tall range
    r = rng.integers(0, k, size=e)        # receivers promised < k
    w = rng.random(e).astype(np.float32) + 0.1
    x = jnp.asarray(rng.normal(size=(n_tall, 8)).astype(np.float32))

    kw = dict(edge_weight=w, edge_pad_multiple=64, block=True,
              block_tm=64, block_eb=64, hub_dense=0)
    g_full = build_graph(s, r, n_tall, **kw)
    g_skip = build_graph(s, r, n_tall, block_max_dst=k, **kw)
    used_tiles = -(-k // 64)
    assert int(np.asarray(g_skip.blocking.tile_idx).max()) < used_tiles
    assert g_skip.blocking.num_blocks < g_full.blocking.num_blocks

    dispatch.set_backend("pallas", interpret=True)
    try:
        def loss(g, x):
            return jnp.sum(spmm(g, x)[:k] ** 2)

        want, gw = jax.value_and_grad(loss, argnums=1)(g_full, x)
        got, gs = jax.value_and_grad(loss, argnums=1)(g_skip, x)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gw),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(spmm(g_skip, x))[:k], np.asarray(spmm(g_full, x))[:k],
            rtol=1e-5, atol=1e-6)
    finally:
        dispatch.set_backend("auto", interpret=False)
