"""SIGN pipeline tests: hop precompute + minibatch distillation training."""

import numpy as np
import jax.numpy as jnp

from conftest import dense_adj

from efficient_gnns_tpu.data import synthetic_node_dataset
from efficient_gnns_tpu.sampling import NodeBatcher, neighbor_average_features
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.sign_trainer import SIGNTrainer


def test_hop_precompute_matches_dense(rng):
    from efficient_gnns_tpu.graphs import build_graph

    n, e, f = 20, 60, 5
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    g = build_graph(s, r, n, edge_pad_multiple=16)
    x = rng.normal(size=(n, f)).astype(np.float32)
    feats = neighbor_average_features(g, jnp.asarray(x), 3)
    a = dense_adj(s, r, n)
    deg = np.maximum(a.sum(1, keepdims=True), 1.0)
    cur = x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(feats[0]), x, rtol=1e-6)
    for hop in range(1, 4):
        cur = a @ cur / deg
        np.testing.assert_allclose(np.asarray(feats[hop]), cur, rtol=1e-4, atol=1e-5)


def test_node_batcher_padding():
    b = NodeBatcher(np.arange(10), batch_size=4, shuffle=False)
    batches = list(b.epoch(0))
    assert len(batches) == 3
    ids, mask = batches[-1]
    assert ids.shape == (4,) and mask.sum() == 2
    all_ids = np.concatenate([i[m] for i, m in batches])
    assert sorted(all_ids.tolist()) == list(range(10))


def test_sign_training_modes():
    ds = synthetic_node_dataset(
        num_nodes=400, num_edges=1600, feat_dim=12, num_classes=4, seed=5,
        label_smoothing_hops=1,
    )
    feats = neighbor_average_features(ds.graph, jnp.asarray(ds.x), 2)
    rng = np.random.default_rng(0)
    t_feat = jnp.asarray(
        np.eye(4, 16, dtype=np.float32)[ds.y]
        + 0.1 * rng.normal(size=(400, 16)).astype(np.float32)
    )
    tl = np.full((400, 4), -2.0, np.float32)
    tl[np.arange(400), ds.y] = 4.0
    t_logits = jnp.asarray(tl)

    for mode, kd_aux in [("supervised", False), ("kd", False), ("nce", True),
                         ("gpw", True), ("at", True), ("fitnet", False)]:
        cfg = DistillConfig(
            training=mode, kd_and_aux=kd_aux, hidden=16, dropout=0.2,
            lr=0.01, beta=1.0, max_samples=64, proj_dim=8,
        )
        tr = SIGNTrainer(
            cfg, feats, ds.y, ds.split_idx, 4, batch_size=128,
            eval_batch_size=256, teacher_feat=t_feat, teacher_logits=t_logits,
        )
        m0 = tr.train_epoch(0)
        for e in range(1, 8):
            m = tr.train_epoch(e)
        assert np.isfinite(m["loss"]), mode
        assert m["loss"] < m0["loss"], (mode, m0, m)
    accs = tr.evaluate()
    assert all(np.isfinite(a) for a in accs)
    assert accs[0] > 0.3  # learning above chance
