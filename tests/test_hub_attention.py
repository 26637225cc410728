"""Hub-dense GAT attention vs dense reference math (interpret mode).

Covers ops/hub_attention.py: the sender-only-logit softmax aggregation
(reference ``arxiv_dgl/models.py:199-218`` with ``--no-attn-dst``) expressed
as static-structure SpMMs over the hub-dense decomposition, including the
hashed-Bernoulli edge-drop and its exact forward/backward consistency.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import random_graph

from efficient_gnns_tpu.ops import dispatch
from efficient_gnns_tpu.ops.hub_attention import (
    _hash_u32,
    _keep_thresh,
    hub_gat_attention,
    supports_hub_attention,
)


@pytest.fixture(autouse=True)
def _pallas_interpret():
    dispatch.set_backend("pallas", interpret=True)
    yield
    dispatch.set_backend("auto", interpret=False)


def _hub_graph(rng, n=60, e=400, hub=4):
    graph, (s, r) = random_graph(
        rng, num_nodes=n, num_edges=e,
        bidirected=True, self_loops=True, block=True, hub_dense=hub,
    )
    assert graph.hub is not None and graph.blocking is not None
    return graph


def _edges_of(graph):
    s = np.asarray(graph.senders)
    r = np.asarray(graph.receivers)
    valid = r < graph.num_nodes
    return s[valid], r[valid]


def _ref_attention(s, r, n, feat, el, slope, keep=None):
    """Dense per-edge reference: lrelu logits -> segment softmax -> agg."""
    h, d = feat.shape[1], feat.shape[2]
    e_log = np.where(el[s] >= 0, el[s], slope * el[s])  # [E, H]
    if keep is None:
        keep = np.ones(len(s), bool)
    out = np.zeros((n, h, d))
    for head in range(h):
        for node in range(n):
            eids = np.nonzero((r == node) & keep)[0]
            if len(eids) == 0:
                continue
            logits = e_log[eids, head]
            a = np.exp(logits - logits.max())
            a = a / a.sum()
            out[node, head] = (a[:, None] * feat[s[eids], head]).sum(0)
    return out


def test_hub_attention_forward_matches_dense(rng):
    graph = _hub_graph(rng)
    n, h, d = graph.num_nodes, 3, 8
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    assert supports_hub_attention(graph)
    out = np.asarray(hub_gat_attention(graph, feat, el, negative_slope=0.2))

    s, r = _edges_of(graph)
    want = _ref_attention(s, r, n, np.asarray(feat), np.asarray(el), 0.2)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_hub_attention_grads_match_dense_formulation(rng):
    graph = _hub_graph(rng)
    n, h, d = graph.num_nodes, 2, 4
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    s, r = _edges_of(graph)
    adj = jnp.zeros((n, n))
    adj = adj.at[jnp.asarray(r), jnp.asarray(s)].add(1.0)

    def dense_loss(feat, el):
        # segment softmax via masked dense logits
        e_log = jax.nn.leaky_relu(el, 0.2)  # [N, H]
        logits = jnp.where(adj[:, :, None] > 0, e_log[None, :, :], -jnp.inf)
        a = jax.nn.softmax(logits, axis=1)  # [N(r), N(s), H]
        a = jnp.where(adj[:, :, None] > 0, a, 0.0)
        out = jnp.einsum("rsh,shd->rhd", a, feat)
        return jnp.sum(out ** 2) + jnp.sum(out)

    def hub_loss(feat, el):
        out = hub_gat_attention(graph, feat, el, negative_slope=0.2)
        return jnp.sum(out ** 2) + jnp.sum(out)

    want = jax.grad(dense_loss, argnums=(0, 1))(feat, el)
    got = jax.grad(hub_loss, argnums=(0, 1))(feat, el)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=2e-4, atol=2e-4)


def _np_hash(x):
    x = np.asarray(x, np.uint64) & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x7FEB352D & 0xFFFFFFFF
    x = (x ^ (x >> 15)) * 0x846CA68B & 0xFFFFFFFF
    return (x ^ (x >> 16)).astype(np.uint64)


def _np_keep(cells, seed, keep_prob, salt):
    h = _np_hash(np.asarray(cells, np.uint64) ^ ((seed + salt) & 0xFFFFFFFF))
    return h < np.uint64(_keep_thresh(keep_prob))


def test_hash_matches_numpy_model(rng):
    eids = jnp.asarray(rng.integers(0, 10_000, size=256).astype(np.int32))
    seed = jnp.uint32(1234)
    got = np.asarray(_hash_u32(eids.astype(jnp.uint32) ^ (seed + jnp.uint32(7))))
    want = _np_hash(np.asarray(eids, np.uint64) ^ np.uint64(1234 + 7))
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_hub_attention_edge_drop_exact(rng):
    """Edge-drop keeps exactly the hashed edge set, softmaxing only kept
    edges (reference models.py:207-214 subset edge-softmax semantics)."""
    graph = _hub_graph(rng, n=50, e=300, hub=4)
    n, h, d = graph.num_nodes, 2, 4
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    seed_val = 987
    edge_drop = 0.4
    keep_prob = 1.0 - edge_drop

    out = np.asarray(hub_gat_attention(
        graph, feat, el, negative_slope=0.2,
        edge_drop=edge_drop, drop_seed=jnp.uint32(seed_val),
    ))

    # replicate the keep decision per edge according to its partition
    hub = graph.hub
    hub_src = set(np.asarray(hub.hub_src).tolist())
    hub_dst = set(np.asarray(hub.hub_dst).tolist())
    hl_s = {int(v): j for j, v in enumerate(np.asarray(hub.hub_src))}
    hl_d = {int(v): j for j, v in enumerate(np.asarray(hub.hub_dst))}
    hs = hub.m_src.shape[1]
    n_pad = graph.num_nodes

    s_all = np.asarray(graph.senders)
    r_all = np.asarray(graph.receivers)
    valid = np.nonzero(r_all < n_pad)[0]
    keep = np.zeros(len(valid), bool)
    for i, eid in enumerate(valid):
        s_, r_ = int(s_all[eid]), int(r_all[eid])
        if s_ in hub_src:
            cell = r_ * hs + hl_s[s_]
            keep[i] = _np_keep(cell, seed_val, keep_prob, 0x51)
        elif r_ in hub_dst:
            cell = hl_d[r_] * n_pad + s_
            keep[i] = _np_keep(cell, seed_val, keep_prob, 0xD5)
        else:
            keep[i] = _np_keep(eid, seed_val, keep_prob, 0x5EED)

    s, r = s_all[valid], r_all[valid]
    want = _ref_attention(s, r, n, np.asarray(feat), np.asarray(el), 0.2,
                          keep=keep)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)
    # the drop must actually remove edges
    assert 0.3 < keep.mean() < 0.9


def test_dgl_gat_conv_uses_hub_path(rng):
    """DGLGATConv on a hub graph (no attn-dst) == XLA path on a plain
    graph with identical parameters."""
    from efficient_gnns_tpu.models.layers import DGLGATConv

    n, e = 60, 400
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    from efficient_gnns_tpu.graphs import build_graph

    g_hub = build_graph(s, r, n, bidirected=True, self_loops=True,
                        block=True, hub_dense=4, edge_pad_multiple=16)
    g_plain = build_graph(s, r, n, bidirected=True, self_loops=True,
                          edge_pad_multiple=16)
    assert supports_hub_attention(g_hub)

    x = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))
    conv = DGLGATConv(out_feats=8, num_heads=2, use_attn_dst=False,
                      use_symmetric_norm=True, residual=True)
    params = conv.init({"params": jax.random.PRNGKey(0)}, g_hub, x)
    out_hub = conv.apply(params, g_hub, x)

    dispatch.set_backend("xla")
    out_plain = conv.apply(params, g_plain, x)
    np.testing.assert_allclose(
        np.asarray(out_hub), np.asarray(out_plain), rtol=2e-4, atol=2e-4
    )
