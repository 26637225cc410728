"""Real-data pathway tests: raw-cache loaders + OGB-Evaluator semantics.

The loaders (data/ppi.py::load_ppi, data/molhiv.py::load_molhiv) read the
exact on-disk formats the reference's dataset packages download
(torch-geometric PPI raw files; OGB ogbg_molhiv csv.gz cache), so a user
with a pre-mounted cache gets real data with no torch/ogb dependency.
These tests write miniature caches in those formats and check the loaders
and the evaluator metrics (accuracy / ROC-AUC / micro-F1) against sklearn.
"""

import gzip
import json
import os

import numpy as np
import pytest

from efficient_gnns_tpu.data.molhiv import load_molhiv, roc_auc
from efficient_gnns_tpu.data.ppi import load_ppi, micro_f1


def _write_ppi_cache(root, rng):
    os.makedirs(root, exist_ok=True)
    sizes = {"train": [30, 40], "valid": [25], "test": [35]}
    truth = {}
    for split, ns in sizes.items():
        feats, labels, gid, links = [], [], [], []
        off = 0
        for g, n in enumerate(ns):
            feats.append(rng.normal(size=(n, 10)).astype(np.float32))
            labels.append((rng.random((n, 7)) < 0.3).astype(np.float32))
            gid.append(np.full(n, g))
            e = 3 * n
            s = rng.integers(0, n, size=e) + off
            r = rng.integers(0, n, size=e) + off
            links += [{"source": int(a), "target": int(b)}
                      for a, b in zip(s, r)]
            off += n
        np.save(os.path.join(root, f"{split}_feats.npy"),
                np.concatenate(feats))
        np.save(os.path.join(root, f"{split}_labels.npy"),
                np.concatenate(labels))
        np.save(os.path.join(root, f"{split}_graph_id.npy"),
                np.concatenate(gid))
        with open(os.path.join(root, f"{split}_graph.json"), "w") as f:
            json.dump({"links": links}, f)
        truth[split] = (ns, np.concatenate(feats), np.concatenate(labels))
    return truth


def test_load_ppi_roundtrip(tmp_path, rng):
    truth = _write_ppi_cache(tmp_path, rng)
    ds = load_ppi(str(tmp_path))
    assert ds.feat_dim == 10 and ds.num_labels == 7
    assert [len(ds.train), len(ds.valid), len(ds.test)] == [2, 1, 1]
    # node counts, features, labels preserved per graph
    ns, feats, labels = truth["train"]
    off = 0
    for g, n in enumerate(ns):
        pg = ds.train[g]
        assert pg.num_nodes == n
        np.testing.assert_array_equal(pg.x[:n], feats[off : off + n])
        np.testing.assert_array_equal(pg.y[:n], labels[off : off + n])
        off += n
    # all graphs share static shapes (single compiled step serves them)
    shapes = {(g.x.shape, g.y.shape, g.graph.num_edges_padded)
              for s in (ds.train, ds.valid, ds.test) for g in s}
    assert len(shapes) == 1
    # undirected + self loops: every graph's edges include both directions
    pg = ds.train[0]
    e = int(pg.graph.n_edge)
    s = np.asarray(pg.graph.senders)[:e]
    r = np.asarray(pg.graph.receivers)[:e]
    pairs = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_load_ppi_missing_cache_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="synthetic"):
        load_ppi(str(tmp_path / "nope"))


def _write_molhiv_cache(root, rng):
    raw = os.path.join(root, "ogbg_molhiv", "raw")
    split = os.path.join(root, "ogbg_molhiv", "split", "scaffold")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)
    n_graphs = 6
    n_nodes = rng.integers(4, 9, size=n_graphs)
    all_edges, all_ef, all_nf, n_edges, labels = [], [], [], [], []
    for n in n_nodes:
        s = np.arange(n - 1)
        e2 = np.stack([np.concatenate([s, s + 1]),
                       np.concatenate([s + 1, s])], axis=1)
        all_edges.append(e2)
        n_edges.append(len(e2))
        all_ef.append(rng.integers(0, 4, size=(len(e2), 3)))
        all_nf.append(rng.integers(0, 20, size=(n, 9)))
        labels.append(int(rng.random() < 0.5))

    def put(name, arr):
        with gzip.open(os.path.join(raw, name), "wt") as f:
            for row in np.atleast_2d(np.asarray(arr)):
                f.write(",".join(str(int(v)) for v in np.atleast_1d(row)) + "\n")

    put("edge.csv.gz", np.concatenate(all_edges))
    put("edge-feat.csv.gz", np.concatenate(all_ef))
    put("node-feat.csv.gz", np.concatenate(all_nf))
    put("num-node-list.csv.gz", np.asarray(n_nodes)[:, None])
    put("num-edge-list.csv.gz", np.asarray(n_edges)[:, None])
    put("graph-label.csv.gz", np.asarray(labels)[:, None])
    ids = np.arange(n_graphs)
    for name, sel in (("train", ids[:4]), ("valid", ids[4:5]),
                      ("test", ids[5:])):
        with gzip.open(os.path.join(split, f"{name}.csv.gz"), "wt") as f:
            f.write("\n".join(str(i) for i in sel) + "\n")
    return n_nodes, n_edges, labels


def test_load_molhiv_roundtrip(tmp_path, rng):
    n_nodes, n_edges, labels = _write_molhiv_cache(tmp_path, rng)
    ds = load_molhiv(str(tmp_path))
    assert [len(ds.train), len(ds.valid), len(ds.test)] == [4, 1, 1]
    m = ds.train[0]
    assert m.num_nodes == n_nodes[0]
    assert len(m.senders) == n_edges[0]
    assert m.atom_feats.shape == (n_nodes[0], 9)
    assert m.bond_feats.shape == (n_edges[0], 3)
    assert ds.train[1].label == float(labels[1])
    assert np.isfinite(ds.mean_log_degree) and ds.mean_log_degree > 0


def test_load_molhiv_missing_cache_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="synthetic"):
        load_molhiv(str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# OGB-Evaluator semantics on stored arrays (reference arxiv_pyg/gnn.py:198-218
# Evaluator accuracy; molhiv ROC-AUC; ppi_pyg/gnn.py:277-288 micro-F1)
# ---------------------------------------------------------------------------


def test_accuracy_matches_ogb_evaluator_semantics(rng):
    """OGB node-classification accuracy == mean(argmax(pred) == y) over the
    split indices — the exact Evaluator 'acc' computation."""
    n, c = 500, 40
    logits = rng.normal(size=(n, c)).astype(np.float32)
    y = rng.integers(0, c, size=n)
    idx = np.sort(rng.choice(n, 200, replace=False))
    got = float((logits[idx].argmax(-1) == y[idx]).mean())
    want = np.equal(logits.argmax(-1)[idx], y[idx]).sum() / len(idx)
    assert got == pytest.approx(want)


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    scores = rng.normal(size=400)
    labels = (rng.random(400) < 0.3).astype(np.int64)
    # inject ties (the rank-based implementation averages them)
    scores[::7] = 0.5
    np.testing.assert_allclose(
        roc_auc(scores, labels), roc_auc_score(labels, scores), atol=1e-12
    )


def test_micro_f1_matches_sklearn(rng):
    from sklearn.metrics import f1_score

    logits = rng.normal(size=(300, 7))
    labels = (rng.random((300, 7)) < 0.4).astype(np.int64)
    got = micro_f1(logits, labels)
    want = f1_score(labels.reshape(-1), (logits > 0).astype(np.int64).reshape(-1),
                    average="micro")
    # sklearn micro-F1 over binary flattened labels counts 0s as a class;
    # the reference flattens exactly like this (ppi_pyg/gnn.py:287)
    want2 = f1_score(labels, (logits > 0).astype(np.int64), average="micro")
    np.testing.assert_allclose(got, want2, atol=1e-12)
    assert not np.isclose(got, want) or np.isclose(want, want2)


def _write_arxiv_cache(root, rng, n=50, e=200, f=8, c=5):
    raw = os.path.join(root, "ogbn_arxiv", "raw")
    split = os.path.join(root, "ogbn_arxiv", "split", "time")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)
    edges = rng.integers(0, n, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, size=n)

    def put(path, arr, fmt):
        with gzip.open(path, "wt") as fh:
            for row in np.atleast_2d(arr):
                fh.write(",".join(fmt % v for v in np.atleast_1d(row)) + "\n")

    put(os.path.join(raw, "edge.csv.gz"), edges, "%d")
    put(os.path.join(raw, "node-feat.csv.gz"), x, "%.6f")
    put(os.path.join(raw, "node-label.csv.gz"), y[:, None], "%d")
    perm = rng.permutation(n)
    for name, sel in (("train", perm[:30]), ("valid", perm[30:40]),
                      ("test", perm[40:])):
        put(os.path.join(split, f"{name}.csv.gz"), np.asarray(sel)[:, None], "%d")
    return edges, x, y


def test_load_ogbn_arxiv_raw_cache(tmp_path, rng):
    from efficient_gnns_tpu.data.ogb import load_ogbn_arxiv

    edges, x, y = _write_arxiv_cache(tmp_path, rng)
    ds = load_ogbn_arxiv(root=str(tmp_path), hub_dense=0)
    assert ds.num_nodes == 50 and ds.num_classes == 40
    np.testing.assert_allclose(ds.x, x, atol=1e-5)
    np.testing.assert_array_equal(ds.y, y)
    assert len(ds.split_idx["train"]) == 30
    # graph is bidirected + self-looped over the raw edges
    e = int(ds.graph.n_edge)
    s = np.asarray(ds.graph.senders)[:e]
    r = np.asarray(ds.graph.receivers)[:e]
    pairs = set(zip(s.tolist(), r.tolist()))
    for a, b in edges[:20]:
        assert (a, b) in pairs and (b, a) in pairs
    assert all((i, i) in pairs for i in range(50))
