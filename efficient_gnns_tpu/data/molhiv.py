"""ogbg-molhiv dataset (synthetic generator + gated OGB loader) and the
static-shape molecule batcher.

Molecules are batched with pad-and-mask packing (graphs/batching.py): every
batch of ``batch_size`` molecules shares one static (node, edge, graph)
budget so the train step compiles once. ROC-AUC is computed with a
rank-based implementation (the OGB Evaluator metric for molhiv).
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple, Optional, Tuple

import numpy as np

from efficient_gnns_tpu.graphs.batching import pack_graphs, pack_node_features
from efficient_gnns_tpu.graphs.container import BatchedGraphs


class Molecule(NamedTuple):
    senders: np.ndarray
    receivers: np.ndarray
    num_nodes: int
    atom_feats: np.ndarray  # int32 [n, 9]
    bond_feats: np.ndarray  # int32 [e, 3]
    label: float


class MolDataset(NamedTuple):
    train: List[Molecule]
    valid: List[Molecule]
    test: List[Molecule]
    num_tasks: int
    mean_log_degree: float  # PNA delta


def synthetic_molhiv_dataset(
    n_train: int = 400,
    n_valid: int = 50,
    n_test: int = 50,
    min_atoms: int = 8,
    max_atoms: int = 24,
    seed: int = 0,
) -> MolDataset:
    rng = np.random.default_rng(seed)

    def make(k):
        """Molecules + raw label scores. The score is a function of the
        VISIBLE inputs (atom features, bond types, connectivity) with mild
        noise, so a GNN can actually rank it (AUC well above chance) —
        iid-noise-dominated labels would cap ROC-AUC near 0.5 regardless of
        the model."""
        mols, scores = [], []
        for _ in range(k):
            n = int(rng.integers(min_atoms, max_atoms + 1))
            atoms = np.zeros((n, 9), np.int32)
            atoms[:, 0] = rng.integers(1, 20, size=n)  # atomic number
            atoms[:, 1:] = rng.integers(0, 2, size=(n, 8))
            # chain + random extra bonds (molecule-like sparsity)
            s = np.arange(n - 1)
            r = s + 1
            extra = max(1, n // 4)
            es = rng.integers(0, n, size=extra)
            er = rng.integers(0, n, size=extra)
            s = np.concatenate([s, es])
            r = np.concatenate([r, er])
            keep = s != r
            s, r = s[keep], r[keep]
            su = np.concatenate([s, r])
            ru = np.concatenate([r, s])
            bonds = np.zeros((len(su), 3), np.int32)
            bonds[:, 0] = rng.integers(0, 4, size=len(su))
            heavy = (atoms[:, 0] > 10).mean()
            aromatic = (bonds[:, 0] == 3).mean() if len(su) else 0.0
            chirality = atoms[:, 1].mean()
            score = (2.0 * heavy + 1.0 * chirality + 0.8 * aromatic
                     + 0.05 * len(su) / n + 0.15 * rng.normal())
            mols.append(Molecule(su, ru, n, atoms, bonds, 0.0))
            scores.append(score)
        return mols, np.asarray(scores)

    train, s_tr = make(n_train)
    valid, s_va = make(n_valid)
    test, s_te = make(n_test)
    # one global threshold (~30% positive) across splits — the same
    # "chemistry" everywhere, like the shared label map of the PPI generator
    thresh = float(np.quantile(s_tr, 0.7))
    train = [m._replace(label=float(s > thresh)) for m, s in zip(train, s_tr)]
    valid = [m._replace(label=float(s > thresh)) for m, s in zip(valid, s_va)]
    test = [m._replace(label=float(s > thresh)) for m, s in zip(test, s_te)]

    degs = []
    for m in train[:100]:
        degs.append(np.log(np.maximum(np.bincount(m.receivers, minlength=m.num_nodes), 1) + 1).mean())
    return MolDataset(
        train=train, valid=valid, test=test,
        num_tasks=1, mean_log_degree=float(np.mean(degs)),
    )


class MolBatcher:
    """Yields fixed-shape packed batches (BatchedGraphs, atoms, bonds, labels,
    graph_mask)."""

    def __init__(self, mols: List[Molecule], batch_size: int,
                 max_atoms: int, shuffle: bool = True):
        self.mols = mols
        self.batch_size = batch_size
        self.node_budget = ((batch_size * max_atoms + 127) // 128) * 128
        # chain+extra bonds, bidirected: < 3 edges per atom on average
        self.edge_budget = ((batch_size * max_atoms * 3 + 1023) // 1024) * 1024
        self.shuffle = shuffle

    def __len__(self):
        return -(-len(self.mols) // self.batch_size)

    def epoch(self, seed: int) -> Iterator[Tuple]:
        order = np.arange(len(self.mols))
        if self.shuffle:
            order = np.random.default_rng(seed).permutation(order)
        b = self.batch_size
        for i in range(0, len(order), b):
            chunk = [self.mols[j] for j in order[i : i + b]]
            batch, offsets, bonds = pack_graphs(
                [(m.senders, m.receivers, m.num_nodes) for m in chunk],
                pad_nodes_to=self.node_budget,
                pad_edges_to=self.edge_budget,
                pad_graphs_to=b,
                edge_payloads=[m.bond_feats for m in chunk],
            )
            atoms = pack_node_features([m.atom_feats for m in chunk], self.node_budget)
            labels = np.zeros(b, np.float32)
            labels[: len(chunk)] = [m.label for m in chunk]
            yield batch, atoms, bonds, labels


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based ROC-AUC (ties averaged) — OGB molhiv metric."""
    scores = np.asarray(scores, np.float64).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), np.float64)
    sorted_scores = scores[order]
    i = 0
    rank = 1
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (rank + rank + (j - i))
        rank += j - i + 1
        i = j + 1
    r_pos = ranks[labels == 1].sum()
    n_pos, n_neg = len(pos), len(neg)
    return float((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def load_molhiv(data_root: str) -> MolDataset:
    """Real ogbg-molhiv from a pre-mounted OGB raw cache (no ogb/torch
    dependency): reads the standard ``ogbg_molhiv/raw/*.csv.gz`` +
    ``split/scaffold/*.csv.gz`` files the ``ogb`` package downloads
    (reference trains on ``PygGraphPropPredDataset('ogbg-molhiv')``,
    mol_pyg results table). Raises FileNotFoundError with a clear message
    when the cache is absent (no network egress here).
    """
    import os

    import pandas as pd

    base = data_root
    if os.path.isdir(os.path.join(data_root, "ogbg_molhiv")):
        base = os.path.join(data_root, "ogbg_molhiv")
    raw = os.path.join(base, "raw")
    split_dir = os.path.join(base, "split", "scaffold")
    needed = [
        os.path.join(raw, f) for f in (
            "edge.csv.gz", "edge-feat.csv.gz", "node-feat.csv.gz",
            "num-node-list.csv.gz", "num-edge-list.csv.gz",
            "graph-label.csv.gz",
        )
    ] + [os.path.join(split_dir, f"{s}.csv.gz")
         for s in ("train", "valid", "test")]
    missing = [p for p in needed if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"ogbg-molhiv raw cache incomplete under {base!r} "
            f"(missing e.g. {missing[0]}). Pre-mount the OGB download "
            "(ogbg_molhiv/raw + split/scaffold) or use --dataset synthetic."
        )

    def csv(path):
        return pd.read_csv(path, header=None).to_numpy()

    edges = csv(os.path.join(raw, "edge.csv.gz")).astype(np.int64)
    edge_feat = csv(os.path.join(raw, "edge-feat.csv.gz")).astype(np.int32)
    node_feat = csv(os.path.join(raw, "node-feat.csv.gz")).astype(np.int32)
    n_nodes = csv(os.path.join(raw, "num-node-list.csv.gz")).reshape(-1).astype(np.int64)
    n_edges = csv(os.path.join(raw, "num-edge-list.csv.gz")).reshape(-1).astype(np.int64)
    labels = csv(os.path.join(raw, "graph-label.csv.gz")).reshape(-1).astype(np.float32)

    node_off = np.zeros(len(n_nodes) + 1, np.int64)
    np.cumsum(n_nodes, out=node_off[1:])
    edge_off = np.zeros(len(n_edges) + 1, np.int64)
    np.cumsum(n_edges, out=edge_off[1:])

    mols = []
    for i in range(len(n_nodes)):
        el, eh = edge_off[i], edge_off[i + 1]
        nl, nh = node_off[i], node_off[i + 1]
        # OGB raw edges are directed rows covering both directions already
        mols.append(Molecule(
            senders=edges[el:eh, 0].copy(),
            receivers=edges[el:eh, 1].copy(),
            num_nodes=int(n_nodes[i]),
            atom_feats=node_feat[nl:nh].copy(),
            bond_feats=edge_feat[el:eh].copy(),
            label=float(labels[i]),
        ))

    def ids(split):
        return csv(os.path.join(split_dir, f"{split}.csv.gz")).reshape(-1).astype(np.int64)

    train = [mols[j] for j in ids("train")]
    degs = [
        np.log(np.maximum(
            np.bincount(m.receivers, minlength=m.num_nodes), 1) + 1).mean()
        for m in train[:1000] if m.num_nodes
    ]
    return MolDataset(
        train=train,
        valid=[mols[j] for j in ids("valid")],
        test=[mols[j] for j in ids("test")],
        num_tasks=1,
        mean_log_degree=float(np.mean(degs)),
    )
