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
    # pin hub messages to float32: these tests assert exactness against
    # dense reference math (the shipping default is bfloat16)
    dispatch.set_backend("pallas", interpret=True,
                         hub_message_dtype=jnp.float32)
    yield
    dispatch.set_backend("auto", interpret=False,
                         hub_message_dtype=jnp.bfloat16)


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


def _np_grid_keep(row, col, seed, keep_prob, salt):
    """NumPy model of _grid_keep_mask: row hashed first, then the column
    folded in with a second avalanche round (no index wrap at any size)."""
    hrow = _np_hash(np.asarray(row, np.uint64) ^ ((seed + salt) & 0xFFFFFFFF))
    h = _np_hash(hrow ^ np.asarray(col, np.uint64))
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
    n_pad = graph.num_nodes

    s_all = np.asarray(graph.senders)
    r_all = np.asarray(graph.receivers)
    valid = np.nonzero(r_all < n_pad)[0]
    keep = np.zeros(len(valid), bool)
    for i, eid in enumerate(valid):
        s_, r_ = int(s_all[eid]), int(r_all[eid])
        if s_ in hub_src:
            keep[i] = _np_grid_keep(r_, hl_s[s_], seed_val, keep_prob, 0x51)
        elif r_ in hub_dst:
            keep[i] = _np_grid_keep(hl_d[r_], s_, seed_val, keep_prob, 0xD5)
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


def test_hub_attention_bf16_messages_close_to_f32(rng):
    """The shipping default (bfloat16 messages, float32 accumulation) stays
    within bf16 tolerance of the float32 path on fwd and grads."""
    graph = _hub_graph(rng)
    n, h, d = graph.num_nodes, 3, 8
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    def loss(feat, el):
        out = hub_gat_attention(graph, feat, el, negative_slope=0.2)
        return jnp.sum(out ** 2), out

    (l32, out32), g32 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        feat, el)
    dispatch.set_backend("pallas", interpret=True,
                         hub_message_dtype=jnp.bfloat16)
    (l16, out16), g16 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        feat, el)

    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(g16[0]), np.asarray(g32[0]),
                               rtol=6e-2, atol=6e-2)
    np.testing.assert_allclose(np.asarray(g16[1]), np.asarray(g32[1]),
                               rtol=6e-2, atol=6e-2)


def test_hub_attention_extreme_logit_spread_stays_finite(rng):
    """Adversarial numerics: drive the per-head logit spread far past the
    documented 60-nat exp floor (hub_attention.py global-max softmax) and
    assert outputs and gradients stay finite, with the documented
    flatten-toward-uniform behavior for receivers entirely >60 nats below
    the global max."""
    graph = _hub_graph(rng, n=40, e=200, hub=4)
    n, h, d = graph.num_nodes, 2, 4
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    # one sender dominates at +200 nats; everyone else sits at -100 ->
    # spread of 300 nats, every non-dominant receiver is >60 nats below max
    el_np = np.full((n, h), -100.0, np.float32)
    el_np[0, :] = 200.0
    el = jnp.asarray(el_np)

    def loss(feat, el):
        out = hub_gat_attention(graph, feat, el, negative_slope=0.2)
        return jnp.sum(out ** 2), out

    (val, out), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                           has_aux=True)(feat, el)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(grads[0])))
    assert np.all(np.isfinite(np.asarray(grads[1])))

    # receivers whose kept senders all sit at the floor get *uniform* edge
    # weights (z identical per sender) -> out = mean of in-neighbor feats
    s, r = _edges_of(graph)
    feat_np = np.asarray(feat)
    out_np = np.asarray(out)
    checked = 0
    for node in range(n):
        eids = np.nonzero(r == node)[0]
        if len(eids) == 0 or np.any(s[eids] == 0):
            continue  # empty or touched by the dominant sender
        want = feat_np[s[eids]].mean(axis=0)
        np.testing.assert_allclose(out_np[node], want, rtol=1e-4, atol=1e-4)
        checked += 1
    assert checked > 0


def test_hub_attention_training_sharpness_no_nan(rng):
    """Logit spreads typical of late GAT training (tens of nats, mixed
    signs) keep every step finite across several drop seeds."""
    graph = _hub_graph(rng, n=50, e=300, hub=4)
    n, h, d = graph.num_nodes, 2, 4
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray((rng.normal(size=(n, h)) * 25.0).astype(np.float32))

    def loss(feat, el, seed):
        out = hub_gat_attention(
            graph, feat, el, negative_slope=0.2,
            edge_drop=0.5, drop_seed=seed,
        )
        return jnp.sum(out ** 2)

    for seed in (1, 2, 3, 4, 5):
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(
            feat, el, jnp.uint32(seed))
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grads[0])))
        assert np.all(np.isfinite(np.asarray(grads[1])))


def test_normalize_vjp_bounded_at_tiny_denominators(rng):
    """Property test of _normalize's custom VJP as den -> 0: the plain-div
    autodiff would square the denominator (underflow -> inf); the custom
    backward must stay finite and match the analytic cotangents whenever
    they are representable."""
    from efficient_gnns_tpu.ops.hub_attention import _normalize

    n, h, d = 8, 2, 4
    num = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    # denominators spanning normal -> subnormal -> exact zero
    den_np = np.array(
        [[1.0, 1e-10], [1e-19, 1e-25], [1e-30, 1e-38],
         [4e-39, 1e-44], [0.0, 1.0], [1e-20, 0.0],
         [5e-1, 1e-35], [1e-42, 1e-15]], np.float32)
    den = jnp.asarray(den_np)
    # scale num so out = num/den is representable (attention outputs are
    # convex combinations -> bounded); tiny den comes with tiny num
    num = num * den[:, :, None]

    def loss(num, den):
        return jnp.sum(_normalize(num, den) ** 2)

    val, (dnum, dden) = jax.value_and_grad(loss, argnums=(0, 1))(num, den)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(dnum)))
    assert np.all(np.isfinite(np.asarray(dden)))
    # empty segments (den == 0) must produce exactly zero cotangents
    zero = den_np == 0.0
    np.testing.assert_array_equal(np.asarray(dnum)[zero], 0.0)
    np.testing.assert_array_equal(np.asarray(dden)[zero], 0.0)
    # against analytic: out = num/den, d(out^2)/dnum = 2*out/den
    safe = den_np > 1e-20
    want_dnum = 2.0 * np.asarray(num) / np.asarray(den)[:, :, None] ** 2
    np.testing.assert_allclose(
        np.asarray(dnum)[safe], want_dnum[safe], rtol=1e-4)


def test_hub_attention_exact_lane_multiple_dim(rng):
    """d an exact 128-multiple leaves no padding slack, so z cannot fold
    into the feature blocks and takes its own trailing 128-block — both
    layouts (z_fold r5 lever vs separate z block) must match the dense
    reference, forward and gradient."""
    graph = _hub_graph(rng)
    n, h, d = graph.num_nodes, 2, 128
    feat = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    out = np.asarray(hub_gat_attention(graph, feat, el, negative_slope=0.2))
    s, r = _edges_of(graph)
    want = _ref_attention(s, r, n, np.asarray(feat), np.asarray(el), 0.2)
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)

    def loss(f, e):
        return jnp.sum(hub_gat_attention(graph, f, e) ** 2)

    gf, ge = jax.grad(loss, argnums=(0, 1))(feat, el)
    assert np.isfinite(np.asarray(gf)).all() and np.isfinite(np.asarray(ge)).all()
    # finite-difference probe on one logit entry
    eps = 1e-3
    el2 = el.at[3, 1].add(eps)
    fd = (float(loss(feat, el2)) - float(loss(feat, el))) / eps
    np.testing.assert_allclose(fd, float(ge[3, 1]), rtol=5e-2, atol=5e-3)
