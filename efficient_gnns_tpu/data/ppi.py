"""PPI dataset (synthetic generator + gated torch-geometric-free loader).

The real PPI benchmark is 24 protein-interaction graphs (20 train / 2 val /
2 test, 50-d features, 121 binary labels). Without network egress the
synthetic generator reproduces the shape: a list of per-graph
``(senders, receivers, num_nodes, x, y)`` with correlated multi-labels so
models can learn.

All graphs are padded to one static (node, edge) budget so a single jitted
train step serves every graph — the reference uses a batch=1 DataLoader
(``ppi_pyg/gnn.py:305-310``), so one-padded-graph-per-step matches its
semantics exactly. PyG's ``GATConv`` adds self loops internally; here the
builder adds them once per graph.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.graphs.preprocess import build_graph, pad_length


class PPIGraph(NamedTuple):
    graph: Graph
    x: np.ndarray  # float32 [pad_nodes, F]
    y: np.ndarray  # float32 [pad_nodes, L] multi-label
    num_nodes: int


class PPIDataset(NamedTuple):
    train: List[PPIGraph]
    valid: List[PPIGraph]
    test: List[PPIGraph]
    feat_dim: int
    num_labels: int


def _make_graph(rng, n_nodes, avg_deg, feat_dim, num_labels, pad_nodes,
                pad_edges, label_map, thresholds):
    """One synthetic PPI graph. Labels are a FIXED function (shared
    ``label_map`` weights + per-label ``thresholds``) of the node features
    mixed with neighbor means — the same "biology" across all graphs, so
    train graphs teach the mapping and val/test graphs measure it
    (inductively learnable, like the real benchmark; iid-random labels
    would cap micro-F1 near the label prior)."""
    x = rng.normal(size=(n_nodes, feat_dim)).astype(np.float32)
    e = n_nodes * avg_deg
    s = rng.integers(0, n_nodes, size=e)
    r = rng.integers(0, n_nodes, size=e)
    su = np.concatenate([s, r])
    ru = np.concatenate([r, s])
    # structure-dependent label scores: x + 0.5 * neighbor mean
    deg = np.bincount(ru, minlength=n_nodes).astype(np.float32)
    nbr = np.zeros_like(x)
    np.add.at(nbr, ru, x[su])
    h = x + 0.5 * nbr / np.maximum(deg, 1.0)[:, None]
    y = (h @ label_map > thresholds).astype(np.float32)
    graph = build_graph(
        su,  # undirected
        ru,
        n_nodes,
        self_loops=True,
        pad_nodes_to=pad_nodes,
        pad_edges_to=pad_edges,
        n_node_valid=n_nodes,
    )
    xp = np.zeros((pad_nodes, feat_dim), np.float32)
    xp[:n_nodes] = x
    yp = np.zeros((pad_nodes, num_labels), np.float32)
    yp[:n_nodes] = y
    return PPIGraph(graph=graph, x=xp, y=yp, num_nodes=n_nodes)


def synthetic_ppi_dataset(
    n_train: int = 8,
    n_valid: int = 2,
    n_test: int = 2,
    min_nodes: int = 100,
    max_nodes: int = 300,
    avg_deg: int = 8,
    feat_dim: int = 50,
    num_labels: int = 121,
    seed: int = 0,
) -> PPIDataset:
    rng = np.random.default_rng(seed)
    pad_nodes = pad_length(max_nodes, 128)
    pad_edges = pad_length(max_nodes * avg_deg * 2 + pad_nodes, 1024)
    # the shared label "biology": one random linear map + per-label
    # thresholds hitting ~30% positive density (real-PPI-like)
    label_map = rng.normal(size=(feat_dim, num_labels)).astype(np.float32)
    label_map /= np.sqrt(feat_dim)
    # score variance per label ~ (1 + 0.5^2/deg-ish); 30% quantile of N(0,s)
    thresholds = (0.53 * np.linalg.norm(label_map, axis=0)).astype(np.float32)

    def make(k):
        return [
            _make_graph(
                rng, int(rng.integers(min_nodes, max_nodes + 1)), avg_deg,
                feat_dim, num_labels, pad_nodes, pad_edges,
                label_map, thresholds,
            )
            for _ in range(k)
        ]

    return PPIDataset(
        train=make(n_train), valid=make(n_valid), test=make(n_test),
        feat_dim=feat_dim, num_labels=num_labels,
    )


def micro_f1(logits: np.ndarray, labels: np.ndarray) -> float:
    """Micro-averaged F1 at threshold 0 (sklearn f1_score(average='micro')
    on ``(logits > 0)`` — reference ``ppi_pyg/gnn.py:277-288``)."""
    pred = (np.asarray(logits) > 0).astype(np.int64).reshape(-1)
    true = np.asarray(labels).astype(np.int64).reshape(-1)
    tp = int(np.sum((pred == 1) & (true == 1)))
    fp = int(np.sum((pred == 1) & (true == 0)))
    fn = int(np.sum((pred == 0) & (true == 1)))
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def load_ppi(data_root: str) -> PPIDataset:
    """Real PPI from a pre-mounted raw cache (no torch dependency).

    Expects the GraphSAGE/torch-geometric raw layout under ``data_root``:
    ``{train,valid,test}_graph.json`` (networkx node-link),
    ``{split}_feats.npy`` [N, 50], ``{split}_labels.npy`` [N, 121],
    ``{split}_graph_id.npy`` [N] — the files ``torch_geometric.datasets.PPI``
    downloads (reference ``ppi_pyg/gnn.py:305-310`` consumes that dataset).
    Raises FileNotFoundError with a clear message when the cache is absent
    (this environment has no network egress for the download).
    """
    import json
    import os

    needed = [
        os.path.join(data_root, f"{split}_{part}")
        for split in ("train", "valid", "test")
        for part in ("graph.json", "feats.npy", "labels.npy", "graph_id.npy")
    ]
    missing = [p for p in needed if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            "PPI raw cache incomplete under "
            f"{data_root!r} (missing e.g. {os.path.basename(missing[0])}). "
            "Pre-mount the torch-geometric PPI raw files "
            "({train,valid,test}_{graph.json,feats.npy,labels.npy,"
            "graph_id.npy}) or use --dataset synthetic."
        )

    splits = {}
    max_nodes = max_edges = 0
    parsed = {}
    for split in ("train", "valid", "test"):
        with open(os.path.join(data_root, f"{split}_graph.json")) as f:
            gjson = json.load(f)
        feats = np.load(os.path.join(data_root, f"{split}_feats.npy"))
        labels = np.load(os.path.join(data_root, f"{split}_labels.npy"))
        gid = np.load(os.path.join(data_root, f"{split}_graph_id.npy"))
        links = np.array(
            [[l["source"], l["target"]] for l in gjson["links"]], np.int64
        )
        if links.size:
            # drop raw self-loops: torch_geometric.datasets.PPI applies
            # remove_self_loops, and build_graph(self_loops=True) re-adds
            # exactly one per node — keeping them here would triple them
            links = links[links[:, 0] != links[:, 1]]
        parsed[split] = (feats, labels, gid, links)
        for g in np.unique(gid):
            sel = np.nonzero(gid == g)[0]
            lo, hi = sel.min(), sel.max()
            m = (links[:, 0] >= lo) & (links[:, 0] <= hi)
            n_g = len(sel)
            e_g = 2 * int(m.sum()) + n_g  # undirected + self loops
            max_nodes = max(max_nodes, n_g)
            max_edges = max(max_edges, e_g)

    pad_nodes = pad_length(max_nodes, 128)
    pad_edges = pad_length(max_edges, 1024)
    for split, (feats, labels, gid, links) in parsed.items():
        graphs = []
        for g in np.unique(gid):
            sel = np.nonzero(gid == g)[0]
            lo, hi = sel.min(), sel.max()
            n_g = len(sel)
            m = (links[:, 0] >= lo) & (links[:, 0] <= hi)
            s = links[m, 0] - lo
            r = links[m, 1] - lo
            graph = build_graph(
                np.concatenate([s, r]),  # undirected, as PyG PPI edges
                np.concatenate([r, s]),
                n_g,
                self_loops=True,  # PyG GATConv adds them per conv
                pad_nodes_to=pad_nodes,
                pad_edges_to=pad_edges,
                n_node_valid=n_g,
            )
            xp = np.zeros((pad_nodes, feats.shape[1]), np.float32)
            xp[:n_g] = feats[lo : hi + 1]
            yp = np.zeros((pad_nodes, labels.shape[1]), np.float32)
            yp[:n_g] = labels[lo : hi + 1]
            graphs.append(PPIGraph(graph=graph, x=xp, y=yp, num_nodes=n_g))
        splits[split] = graphs

    return PPIDataset(
        train=splits["train"], valid=splits["valid"], test=splits["test"],
        feat_dim=parsed["train"][0].shape[1],
        num_labels=parsed["train"][1].shape[1],
    )
