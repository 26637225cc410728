"""Model zoo smoke + semantics tests on small random graphs."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import random_graph

from efficient_gnns_tpu.graphs import build_graph, gcn_norm_weights
from efficient_gnns_tpu.graphs.batching import pack_graphs, pack_node_features
from efficient_gnns_tpu import models


def _init_and_run(model, *args, method_kwargs=None, **init_kwargs):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, *args, **(method_kwargs or {}))
    out, _ = model.apply(
        variables, *args, **(method_kwargs or {}),
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    return variables, out


def test_gcn_forward_shapes(rng):
    n, f, c = 30, 16, 7
    g, _ = random_graph(rng, n, 90)
    g = gcn_norm_weights(g)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    model = models.GCN(hidden=24, out_feats=c, num_layers=3)
    _, (logits, out_feat) = _init_and_run(model, g, x)
    assert logits.shape == (n, c)
    assert out_feat.shape == (n, 24)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_sage_and_dglgcn(rng):
    n, f, c = 25, 10, 5
    g, _ = random_graph(rng, n, 70)
    g2 = gcn_norm_weights(g)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    for model in [
        models.SAGE(hidden=12, out_feats=c, num_layers=2),
        models.DGLGCN(hidden=12, out_feats=c, num_layers=3, use_linear=True),
    ]:
        gg = g2 if isinstance(model, models.DGLGCN) else g
        _, (logits, feat) = _init_and_run(model, gg, x)
        assert logits.shape == (n, c)
        assert np.all(np.isfinite(np.asarray(logits)))


def test_gat_teacher_forward_and_train_mode(rng):
    n, f, c = 40, 12, 6
    s = rng.integers(0, n, size=100)
    r = rng.integers(0, n, size=100)
    g = build_graph(s, r, n, bidirected=True, self_loops=True, edge_pad_multiple=64)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    model = models.GATTeacher(
        hidden=8, out_feats=c, num_layers=3, num_heads=3,
        use_symmetric_norm=True, use_attn_dst=False, edge_drop=0.3,
    )
    variables, (logits, _) = _init_and_run(model, g, x)
    assert logits.shape == (n, c)
    # training mode with edge drop + dropout
    (logits_t, feat_t), _ = model.apply(
        variables, g, x, training=True,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert feat_t.shape == (n, 3 * 8)
    assert np.all(np.isfinite(np.asarray(logits_t)))
    # grads flow
    def loss_fn(params):
        (lg, _), _ = model.apply(
            {**variables, "params": params}, g, x, training=True,
            rngs={"dropout": jax.random.PRNGKey(4)}, mutable=["batch_stats"],
        )
        return jnp.sum(lg**2)
    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(float(jnp.abs(l).sum()) > 0 for l in flat)


def test_sign_forward(rng):
    n, f, c, hops = 50, 14, 8, 4
    feats = [jnp.asarray(rng.normal(size=(n, f)).astype(np.float32)) for _ in range(hops)]
    model = models.SIGN(hidden=16, out_feats=c, num_hops=hops, ff_layers=2, dropout=0.5)
    _, (logits, out_feat) = _init_and_run(model, feats)
    assert logits.shape == (n, c)
    assert out_feat.shape == (n, 16 * hops)


def test_rgcn_forward(rng):
    n, c = 30, 4
    num_rel, num_nt = 3, 2
    e = 80
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    et = rng.integers(0, num_rel, size=e)
    g = build_graph(s, r, n, edge_type=et, num_edge_types=num_rel, edge_pad_multiple=32)
    node_type = jnp.asarray(rng.integers(0, num_nt, size=n).astype(np.int32))
    local_idx = jnp.asarray(np.arange(n, dtype=np.int32))
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    model = models.RGCN(
        hidden=12, out_feats=c, num_layers=2, num_node_types=num_nt,
        num_edge_types=num_rel, emb_sizes=((1, n),), in_feats=8,
    )
    _, (logits, _) = _init_and_run(model, g, x, node_type, local_idx)
    assert logits.shape == (n, c)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_rgcn_relation_mean_semantics(rng):
    # single relation, deterministic check of mean aggregation + root linear
    n = 6
    s = np.array([0, 1, 2, 3])
    r = np.array([5, 5, 5, 0])
    et = np.zeros(4, dtype=np.int64)
    g = build_graph(s, r, n, edge_type=et, num_edge_types=1, edge_pad_multiple=8)
    x = jnp.asarray(np.eye(6, 4, dtype=np.float32))
    layer = models.RGCNConv(features=4, num_node_types=1, num_edge_types=1)
    variables = layer.init(jax.random.PRNGKey(0), g, x, jnp.zeros(n, jnp.int32))
    out = layer.apply(variables, g, x, jnp.zeros(n, jnp.int32))
    w_rel = variables["params"]["rel_lin_0"]["kernel"]
    w_root = variables["params"]["root_lin_0"]["kernel"]
    b_root = variables["params"]["root_lin_0"]["bias"]
    expect5 = np.asarray(x[:3].mean(0) @ w_rel + x[5] @ w_root + b_root)
    np.testing.assert_allclose(np.asarray(out[5]), expect5, rtol=1e-5, atol=1e-5)


def test_ppi_nets(rng):
    n, f, c = 35, 9, 11
    s = rng.integers(0, n, size=90)
    r = rng.integers(0, n, size=90)
    g = build_graph(s, r, n, self_loops=True, edge_pad_multiple=64)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    model = models.PPIGAT(hidden=10, out_feats=c, num_layers=3, heads=2, final_heads=3)
    _, (logits, feat) = _init_and_run(model, g, x)
    assert logits.shape == (n, c)
    assert feat.shape == (n, 20)


def test_mol_models(rng):
    graphs, atom_list, bond_list = [], [], []
    for _ in range(3):
        nn_ = int(rng.integers(4, 9))
        ee = int(rng.integers(4, 12))
        s = rng.integers(0, nn_, size=ee)
        r = rng.integers(0, nn_, size=ee)
        graphs.append((s, r, nn_))
        atom_list.append(rng.integers(0, 2, size=(nn_, 9)).astype(np.int32))
        bond_list.append(rng.integers(0, 2, size=(ee, 3)).astype(np.int32))
    batch, offsets, bonds = pack_graphs(
        graphs, pad_nodes_to=32, pad_edges_to=64, pad_graphs_to=4,
        edge_payloads=bond_list,
    )
    atoms = jnp.asarray(pack_node_features(atom_list, 32))
    bonds = jnp.asarray(bonds)
    for conv in ["gine", "gcn", "pna"]:
        model = models.MolGNN(
            conv=conv, hidden=20, num_tasks=1, num_layers=2,
            virtual_node=(conv == "gine"), pna_towers=4,
        )
        _, (out, gfeat) = _init_and_run(model, batch, atoms, bonds)
        assert out.shape == (4, 1)
        assert gfeat.shape == (4, 20)
        assert np.all(np.isfinite(np.asarray(out))), conv
        # padded graph slot produces finite output; mask available
        assert np.asarray(batch.graph_mask).tolist() == [True, True, True, False]


def test_projections(rng):
    n = 20
    g, _ = random_graph(rng, n, 50)
    g = gcn_norm_weights(g)
    x = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))
    for m in [models.ProjectionMLP(proj_dim=8), models.ProjectionLinear(proj_dim=8)]:
        rngs = {"params": jax.random.PRNGKey(0)}
        v = m.init(rngs, x)
        out, _ = m.apply(v, x, mutable=["batch_stats"])
        assert out.shape == (n, 8)
    m = models.ProjectionGCD(proj_dim=8)
    v = m.init({"params": jax.random.PRNGKey(0)}, g, x)
    out, _ = m.apply(v, g, x, mutable=["batch_stats"])
    assert out.shape == (n, 8)
