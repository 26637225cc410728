"""End-to-end training tests: tiny synthetic graph, every distill mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficient_gnns_tpu.data import synthetic_node_dataset
from efficient_gnns_tpu.graphs.preprocess import induced_subgraph
from efficient_gnns_tpu.models import GCN
from efficient_gnns_tpu.train import DistillConfig, Logger, NodeDistillTrainer


def _tiny_dataset():
    return synthetic_node_dataset(
        num_nodes=300, num_edges=1200, feat_dim=16, num_classes=5, seed=1,
        label_smoothing_hops=1,
    )


def _fake_teacher(ds, dim=24, seed=0):
    rng = np.random.default_rng(seed)
    protos_f = rng.normal(size=(ds.num_classes, dim)).astype(np.float32)
    feat = protos_f[ds.y] + 0.1 * rng.normal(size=(len(ds.y), dim)).astype(np.float32)
    logits = np.full((len(ds.y), ds.num_classes), -3.0, np.float32)
    logits[np.arange(len(ds.y)), ds.y] = 3.0
    return jnp.asarray(feat), jnp.asarray(logits)


def test_supervised_training_converges():
    ds = _tiny_dataset()
    cfg = DistillConfig(training="supervised", epochs=60, hidden=32, num_layers=2, lr=0.01)
    tr = NodeDistillTrainer(
        GCN(hidden=cfg.hidden, out_feats=ds.num_classes, num_layers=cfg.num_layers,
            dropout=0.3),
        cfg, ds.graph, ds.x, ds.y, ds.split_idx,
    )
    _, acc0 = tr.evaluate()
    losses = [tr.train_epoch(e)["loss"] for e in range(60)]
    _, acc1 = tr.evaluate()
    assert losses[-1] < losses[0] * 0.7
    assert acc1[0] > max(acc0[0], 0.5), (acc0, acc1)  # train acc well above chance


@pytest.mark.parametrize(
    "mode,kd_and_aux",
    [
        ("kd", False),
        ("fitnet", False),
        ("at", False),
        ("gpw", False),
        ("lpw", False),
        ("nce", False),
        ("gcd", False),
        ("nce", True),
        ("lpw", True),
    ],
)
def test_distill_modes_run_and_decrease(mode, kd_and_aux):
    ds = _tiny_dataset()
    t_feat, t_logits = _fake_teacher(ds)
    lsp_graph = None
    if mode == "lpw":
        lsp_graph = induced_subgraph(
            ds.senders, ds.receivers, ds.split_idx["train"], edge_pad_multiple=64
        )
    cfg = DistillConfig(
        training=mode, kd_and_aux=kd_and_aux, epochs=15, hidden=32, num_layers=2,
        proj_dim=16, beta=1.0 if mode in ("gpw", "nce", "gcd") else 100.0,
        max_samples=64, teacher_dim=t_feat.shape[1],
    )
    tr = NodeDistillTrainer(
        GCN(hidden=cfg.hidden, out_feats=ds.num_classes, num_layers=2, dropout=0.2),
        cfg, ds.graph, ds.x, ds.y, ds.split_idx,
        teacher_feat=t_feat, teacher_logits=t_logits, lsp_graph=lsp_graph,
    )
    m0 = tr.train_epoch(0)
    for e in range(1, 15):
        m = tr.train_epoch(e)
    assert np.isfinite(m["loss"]), (mode, m)
    assert m["loss"] < m0["loss"], (mode, m0, m)
    _, accs = tr.evaluate()
    assert all(np.isfinite(a) for a in accs)


def test_logger_best_val_selection():
    lg = Logger(runs=2)
    lg.add_result(0, (0.9, 0.5, 0.55))
    lg.add_result(0, (0.95, 0.7, 0.66))  # best valid
    lg.add_result(0, (0.99, 0.6, 0.70))
    lg.add_result(1, (0.9, 0.8, 0.60))
    lg.add_result(1, (0.95, 0.75, 0.72))
    s0 = lg.run_statistics(0)
    assert s0["best_epoch"] == 1 and s0["final_test"] == 0.66
    s = lg.statistics()
    np.testing.assert_allclose(s["final_test_mean"], (0.66 + 0.60) / 2)


def test_checkpoint_resume_roundtrip(tmp_path, rng):
    import jax.numpy as jnp
    from efficient_gnns_tpu.data import synthetic_node_dataset
    from efficient_gnns_tpu.models import GCN
    from efficient_gnns_tpu.train import DistillConfig, NodeDistillTrainer

    ds = synthetic_node_dataset(num_nodes=200, num_edges=800, feat_dim=16,
                                num_classes=4, seed=0)
    tl = np.full((200, 4), -2.0, np.float32)
    tl[np.arange(200), ds.y] = 4.0
    cfg = DistillConfig(training="kd", epochs=2, hidden=8, num_layers=2)

    def make():
        return NodeDistillTrainer(
            GCN(hidden=8, out_feats=4, num_layers=2), cfg,
            ds.graph, ds.x, ds.y, ds.split_idx,
            teacher_logits=jnp.asarray(tl), seed=0,
        )

    a = make()
    a.train_epoch(1)
    a.train_epoch(2)
    path = str(tmp_path / "ck.msgpack")
    a.save_checkpoint(path)
    logits_a, _ = a.evaluate()

    b = make()
    step = b.restore_checkpoint(path)
    assert step == 2
    logits_b, _ = b.evaluate()
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b))
    # training continues from the restored optimizer state identically
    a.train_epoch(3); b.train_epoch(3)
    la, _ = a.evaluate(); lb, _ = b.evaluate()
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_plot_curves(tmp_path):
    from efficient_gnns_tpu.train.metrics import MetricsWriter
    from efficient_gnns_tpu.analysis import plot_curves

    d = str(tmp_path / "run")
    w = MetricsWriter(d)
    for e in range(1, 4):
        w.write(e, {"loss/train": 1.0 / e, "acc/valid": 0.2 * e})
    w.close()
    out = plot_curves(d)
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0
