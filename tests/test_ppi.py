"""PPI inductive pipeline tests."""

import numpy as np
import pytest

from efficient_gnns_tpu.data.ppi import micro_f1, synthetic_ppi_dataset
from efficient_gnns_tpu.models import PPIGAT, ppi_student, ppi_teacher
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.ppi_trainer import PPITrainer


def test_micro_f1():
    logits = np.array([[2.0, -1.0], [1.0, 1.0]])
    labels = np.array([[1, 0], [0, 1]])
    # preds: [1,0],[1,1] -> tp=2 fp=1 fn=0 -> f1 = 4/5
    np.testing.assert_allclose(micro_f1(logits, labels), 0.8)


def _tiny_ds():
    return synthetic_ppi_dataset(
        n_train=3, n_valid=1, n_test=1, min_nodes=40, max_nodes=80,
        avg_deg=5, feat_dim=16, num_labels=12, seed=0,
    )


def test_ppi_static_shapes():
    ds = _tiny_ds()
    shapes = {
        (g.graph.num_nodes, g.graph.num_edges_padded)
        for g in ds.train + ds.valid + ds.test
    }
    assert len(shapes) == 1  # one compiled step serves all graphs


@pytest.mark.parametrize("mode,kd_aux", [
    ("supervised", False), ("kd", False), ("nce", False),
    ("lpw", True), ("gpw", False), ("at", True), ("fitnet", True),
])
def test_ppi_modes(mode, kd_aux):
    ds = _tiny_ds()
    cfg = DistillConfig(
        training=mode, kd_and_aux=kd_aux, lr=0.005, alpha=0.5, kd_T=1.0,
        beta=1.0 if mode in ("gpw", "nce") else 100.0,
        max_samples=64, proj_dim=8,
    )
    student = PPIGAT(hidden=8, out_feats=ds.num_labels, num_layers=2, heads=2)
    teacher = PPIGAT(hidden=12, out_feats=ds.num_labels, num_layers=2, heads=2)
    tr = PPITrainer(cfg, ds, student, teacher=teacher,
                    teacher_feat_dim=24, seed=0)
    m0 = tr.train_epoch(0)
    for e in range(1, 4):
        m = tr.train_epoch(e)
    assert np.isfinite(m["loss"]), (mode, m)
    assert m["loss"] <= m0["loss"] * 1.5, (mode, m0, m)


def test_ppi_supervised_learns():
    ds = _tiny_ds()
    cfg = DistillConfig(training="supervised", lr=0.005)
    student = PPIGAT(hidden=16, out_feats=ds.num_labels, num_layers=2, heads=2)
    tr = PPITrainer(cfg, ds, student, seed=0)
    f0 = tr.evaluate_all()
    for e in range(30):
        tr.train_epoch(e)
    f1 = tr.evaluate_all()
    assert f1[0] > f0[0], (f0, f1)
    assert f1[0] > 0.45


def test_reference_teacher_student_configs():
    t = ppi_teacher(121)
    s = ppi_student(121)
    assert (t.hidden, t.heads, t.num_layers, t.final_heads) == (256, 4, 3, 6)
    assert (s.hidden, s.heads, s.num_layers) == (68, 2, 5)
