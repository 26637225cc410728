"""molhiv graph-classification pipeline tests."""

import numpy as np
import pytest

from efficient_gnns_tpu.data.molhiv import (
    MolBatcher,
    roc_auc,
    synthetic_molhiv_dataset,
)
from efficient_gnns_tpu.models.mol import MolGNN
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.mol_trainer import MolTrainer


def test_roc_auc_matches_known_values():
    # perfect ranking
    assert roc_auc([0.1, 0.2, 0.8, 0.9], [0, 0, 1, 1]) == 1.0
    # random-ish
    np.testing.assert_allclose(roc_auc([0.9, 0.1, 0.8, 0.2], [0, 0, 1, 1]), 0.5)
    # with ties
    np.testing.assert_allclose(roc_auc([0.5, 0.5, 0.5, 0.5], [0, 1, 0, 1]), 0.5)
    # against sklearn if available
    try:
        from sklearn.metrics import roc_auc_score

        rng = np.random.default_rng(0)
        s = rng.normal(size=200)
        y = (rng.random(200) < 0.3).astype(int)
        np.testing.assert_allclose(roc_auc(s, y), roc_auc_score(y, s), rtol=1e-9)
    except ImportError:
        pass


def test_mol_batcher_static_shapes():
    ds = synthetic_molhiv_dataset(n_train=20, n_valid=5, n_test=5, seed=1)
    b = MolBatcher(ds.train, batch_size=8, max_atoms=24, shuffle=False)
    shapes = set()
    count = 0
    for batch, atoms, bonds, labels in b.epoch(0):
        shapes.add((batch.graph.num_nodes, batch.graph.num_edges_padded,
                    batch.num_graphs, atoms.shape, bonds.shape))
        count += int(batch.n_graph)
    assert len(shapes) == 1
    assert count == 20


@pytest.mark.parametrize("conv,mode", [
    ("gcn", "supervised"), ("gine", "kd"), ("gcn", "nce"), ("gin", "gpw"),
])
def test_mol_trainer_modes(conv, mode):
    ds = synthetic_molhiv_dataset(n_train=48, n_valid=16, n_test=16, seed=2)
    cfg = DistillConfig(training=mode, lr=0.003, alpha=0.5, kd_T=1.0,
                        beta=0.5, max_samples=32, proj_dim=8)
    student = MolGNN(conv=conv, hidden=16, num_tasks=1, num_layers=2, dropout=0.2)
    teacher = MolGNN(conv="gine", hidden=24, num_tasks=1, num_layers=2,
                     virtual_node=True)
    tr = MolTrainer(cfg, ds, student,
                    teacher=teacher if mode != "supervised" else None,
                    batch_size=16, max_atoms=24, seed=0)
    m0 = tr.train_epoch(0)
    for e in range(1, 4):
        m = tr.train_epoch(e)
    assert np.isfinite(m["loss"]), (conv, mode, m)
    aucs = tr.evaluate_all()
    assert all(np.isfinite(a) for a in aucs)


def test_mol_pna_learns():
    ds = synthetic_molhiv_dataset(n_train=120, n_valid=30, n_test=30, seed=3)
    cfg = DistillConfig(training="supervised", lr=0.005)
    student = MolGNN(conv="pna", hidden=16, num_tasks=1, num_layers=2,
                     dropout=0.1, pna_towers=4, pna_delta=ds.mean_log_degree)
    tr = MolTrainer(cfg, ds, student, batch_size=32, max_atoms=24, seed=0)
    for e in range(12):
        tr.train_epoch(e)
    aucs = tr.evaluate_all()
    assert aucs[0] > 0.75, aucs  # train AUC well above chance
