"""Generate FULL-SCALE fake data caches in the exact on-disk formats the
real-data loaders read, so the real-data pathway can be rehearsed end-to-end
at real sizes before any actual cache is mounted (VERDICT r4 item 7).

    python experiments/make_fake_caches.py --root dataset_fake [--only arxiv]

Produces:
  * ``ogbn_arxiv/raw/*.csv.gz`` + ``split/time/*.csv.gz`` at the real arxiv
    shape (169,343 nodes x 128 feats, 1,166,243 edges, 40 classes, real
    split sizes 90,941/29,799/48,603) — read by data/ogb.py.
  * ``ppi/{split}_{graph.json,feats.npy,labels.npy,graph_id.npy}`` at the
    real PPI shape (24 graphs, ~2,373 nodes each, 50 feats, 121 labels) —
    read by data/ppi.py.
  * ``ogbg_molhiv/raw/*.csv.gz`` + ``split/scaffold/*.csv.gz`` at the real
    molhiv shape (41,127 molecules, ~25.5 atoms each) — read by
    data/molhiv.py.

Labels/features are synthetic (prototype-planted, like data/synthetic.py)
so one training epoch produces finite, learnable losses; the point of the
rehearsal is the load + build + step path at real scale, not accuracy.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import time

import numpy as np


def _write_csv_gz(path, arr, fmt):
    """np.savetxt into gzip — pandas-free, deterministic, fast enough."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt", compresslevel=1) as f:
        np.savetxt(f, arr, fmt=fmt, delimiter=",")


def make_arxiv(root, seed=0):
    t0 = time.time()
    rng = np.random.default_rng(seed)
    n, e, fdim, classes = 169_343, 1_166_243, 128, 40
    base = os.path.join(root, "ogbn_arxiv")
    y = rng.integers(0, classes, size=n)
    protos = rng.normal(size=(classes, fdim)).astype(np.float32)
    x = (protos[y] * 0.5 + rng.normal(size=(n, fdim))).astype(np.float32)
    s = rng.zipf(1.4, size=e * 2) % n
    r = rng.integers(0, n, size=e * 2)
    keep = s != r
    edges = np.stack([s[keep][:e], r[keep][:e]], axis=1)
    perm = rng.permutation(n)
    split = {"train": perm[:90_941], "valid": perm[90_941:120_740],
             "test": perm[120_740:]}
    _write_csv_gz(os.path.join(base, "raw", "edge.csv.gz"), edges, "%d")
    _write_csv_gz(os.path.join(base, "raw", "node-feat.csv.gz"), x, "%.6f")
    _write_csv_gz(os.path.join(base, "raw", "node-label.csv.gz"),
                  y[:, None], "%d")
    for k, idx in split.items():
        _write_csv_gz(os.path.join(base, "split", "time", f"{k}.csv.gz"),
                      np.sort(idx)[:, None], "%d")
    print(f"arxiv cache -> {base} ({time.time() - t0:.1f}s)")


def make_ppi(root, seed=0):
    t0 = time.time()
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "ppi")
    os.makedirs(base, exist_ok=True)
    n_graphs = {"train": 20, "valid": 2, "test": 2}
    protos = rng.normal(size=(121, 50)).astype(np.float32)
    for split, k in n_graphs.items():
        nodes_per = rng.integers(1800, 3200, size=k)
        total = int(nodes_per.sum())
        feats = np.zeros((total, 50), np.float32)
        labels = rng.random((total, 121)) < 0.4
        gid = np.zeros(total, np.int64)
        links = []
        off = 0
        for g in range(k):
            ng = int(nodes_per[g])
            gid[off:off + ng] = g
            lab = labels[off:off + ng]
            feats[off:off + ng] = (
                lab.astype(np.float32) @ protos / 10.0
                + rng.normal(size=(ng, 50)) * 0.5
            )
            e = ng * 14  # real PPI mean degree ~28 (bidirected)
            es = rng.integers(0, ng, size=e) + off
            er = rng.integers(0, ng, size=e) + off
            links.append(np.stack([es, er], axis=1))
            off += ng
        links = np.concatenate(links)
        gjson = {
            "directed": False, "multigraph": False, "graph": {},
            "nodes": [{"id": int(i)} for i in range(total)],
            "links": [{"source": int(a), "target": int(b)} for a, b in links],
        }
        with open(os.path.join(base, f"{split}_graph.json"), "w") as f:
            json.dump(gjson, f)
        np.save(os.path.join(base, f"{split}_feats.npy"), feats)
        np.save(os.path.join(base, f"{split}_labels.npy"),
                labels.astype(np.float32))
        np.save(os.path.join(base, f"{split}_graph_id.npy"), gid)
    print(f"ppi cache -> {base} ({time.time() - t0:.1f}s)")


def make_molhiv(root, seed=0):
    t0 = time.time()
    rng = np.random.default_rng(seed)
    n_mols = 41_127
    base = os.path.join(root, "ogbg_molhiv")
    n_nodes = rng.integers(10, 42, size=n_mols)
    n_edges = (n_nodes * 2 + rng.integers(-2, 6, size=n_mols)).clip(2)
    total_n, total_e = int(n_nodes.sum()), int(n_edges.sum())
    node_feat = np.zeros((total_n, 9), np.int32)
    node_feat[:, 0] = rng.integers(1, 119, size=total_n)
    node_feat[:, 1:] = rng.integers(0, 4, size=(total_n, 8))
    edge_feat = rng.integers(0, 4, size=(total_e, 3)).astype(np.int32)
    edges = np.zeros((total_e, 2), np.int64)
    off = 0
    for i in range(n_mols):
        e = int(n_edges[i])
        edges[off:off + e] = rng.integers(0, n_nodes[i], size=(e, 2))
        off += e
    # label correlated with visible heavy-atom fraction (learnable)
    heavy = np.zeros(n_mols)
    off = 0
    for i in range(n_mols):
        heavy[i] = (node_feat[off:off + n_nodes[i], 0] > 50).mean()
        off += n_nodes[i]
    label = (heavy + 0.2 * rng.normal(size=n_mols)
             > np.quantile(heavy, 0.965)).astype(np.int64)  # ~3.5% positive
    perm = rng.permutation(n_mols)
    split = {"train": perm[:32_901], "valid": perm[32_901:37_014],
             "test": perm[37_014:]}
    _write_csv_gz(os.path.join(base, "raw", "edge.csv.gz"), edges, "%d")
    _write_csv_gz(os.path.join(base, "raw", "edge-feat.csv.gz"), edge_feat, "%d")
    _write_csv_gz(os.path.join(base, "raw", "node-feat.csv.gz"), node_feat, "%d")
    _write_csv_gz(os.path.join(base, "raw", "num-node-list.csv.gz"),
                  n_nodes[:, None], "%d")
    _write_csv_gz(os.path.join(base, "raw", "num-edge-list.csv.gz"),
                  n_edges[:, None], "%d")
    _write_csv_gz(os.path.join(base, "raw", "graph-label.csv.gz"),
                  label[:, None], "%d")
    for k, idx in split.items():
        _write_csv_gz(os.path.join(base, "split", "scaffold", f"{k}.csv.gz"),
                      np.sort(idx)[:, None], "%d")
    print(f"molhiv cache -> {base} ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="dataset_fake")
    p.add_argument("--only", type=str, default=None,
                   choices=[None, "arxiv", "ppi", "molhiv"])
    a = p.parse_args()
    if a.only in (None, "arxiv"):
        make_arxiv(a.root)
    if a.only in (None, "ppi"):
        make_ppi(a.root)
    if a.only in (None, "molhiv"):
        make_molhiv(a.root)
