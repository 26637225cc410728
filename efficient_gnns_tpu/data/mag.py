"""ogbn-mag dataset (synthetic generator + gated OGB loader).

Produces the grouped-homogeneous typed graph the R-GCN trainers consume
(graphs/hetero.py), matching the reference pipeline
(``mag_pyg/gnn.py:307-357``): 4 node types, 7 relations after augmentation,
features only on paper nodes, labels/splits on papers.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

from efficient_gnns_tpu.graphs.hetero import GroupedHetero, mag_preprocess


class MagDataset(NamedTuple):
    grouped: GroupedHetero
    x_paper: np.ndarray  # float32 [n_paper, feat]
    y_paper: np.ndarray  # int32 [n_paper]
    split_idx: Dict[str, np.ndarray]  # paper-local ids
    num_classes: int
    num_nodes_dict: Dict[str, int]
    num_edge_types: int


def synthetic_mag_dataset(
    n_paper: int = 4000,
    n_author: int = 2000,
    n_inst: int = 100,
    n_field: int = 200,
    feat_dim: int = 128,
    num_classes: int = 16,
    avg_cites: int = 5,
    seed: int = 0,
    signal: float = 0.8,
    label_noise: float = 0.0,
    homophily: float = 0.5,
) -> MagDataset:
    """``signal`` scales the class-prototype feature component, ``homophily``
    the fraction of same-class citations, and ``label_noise`` relabels that
    fraction of papers AFTER the (true-label-driven) edges are built — the
    same difficulty knobs as data/synthetic.py. Defaults reproduce the easy
    (near-saturating) task for convergence tests; hardened runs lower
    signal/homophily and raise label_noise so accuracies land mid-range
    where distillation deltas are resolvable (VERDICT r4 items 3/4)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=n_paper).astype(np.int32)
    protos = rng.normal(size=(num_classes, feat_dim)).astype(np.float32)
    x = protos[y] * signal + rng.normal(size=(n_paper, feat_dim)).astype(np.float32)

    def edges(n_src, n_dst, count, homophily_labels=None):
        s = rng.integers(0, n_src, size=count)
        r = rng.integers(0, n_dst, size=count)
        if homophily_labels is not None and homophily > 0:
            # citations favor same-class papers (vectorized per class)
            same_idx = np.where(rng.random(count) < homophily)[0]
            cls_of_edge = homophily_labels[s[same_idx]]
            for c in range(num_classes):
                m = same_idx[cls_of_edge == c]
                pool = np.where(homophily_labels == c)[0]
                if len(pool) and len(m):
                    r[m] = pool[rng.integers(0, len(pool), size=len(m))]
        return np.stack([s, r])

    edge_index_dict = {
        ("paper", "cites", "paper"): edges(n_paper, n_paper, avg_cites * n_paper, y),
        ("author", "writes", "paper"): edges(n_author, n_paper, 3 * n_author),
        ("author", "affiliated_with", "institution"): edges(n_author, n_inst, n_author),
        ("paper", "has_topic", "field_of_study"): edges(n_paper, n_field, 2 * n_paper),
    }
    num_nodes_dict = {
        "paper": n_paper,
        "author": n_author,
        "institution": n_inst,
        "field_of_study": n_field,
    }
    grouped = mag_preprocess(edge_index_dict, num_nodes_dict)

    if label_noise > 0:
        flip = rng.random(n_paper) < label_noise
        y = np.where(
            flip, rng.integers(0, num_classes, size=n_paper), y
        ).astype(np.int32)

    perm = rng.permutation(n_paper)
    n_tr, n_va = int(0.6 * n_paper), int(0.2 * n_paper)
    split_idx = {
        "train": np.sort(perm[:n_tr]).astype(np.int64),
        "valid": np.sort(perm[n_tr : n_tr + n_va]).astype(np.int64),
        "test": np.sort(perm[n_tr + n_va :]).astype(np.int64),
    }
    return MagDataset(
        grouped=grouped,
        x_paper=x,
        y_paper=y,
        split_idx=split_idx,
        num_classes=num_classes,
        num_nodes_dict=num_nodes_dict,
        num_edge_types=7,
    )


def load_ogbn_mag(root: str = "dataset") -> MagDataset:  # pragma: no cover
    """Real ogbn-mag via the OGB package (needs cached download)."""
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError as e:
        raise RuntimeError("ogb not installed; use the synthetic MAG dataset") from e

    dataset = NodePropPredDataset(name="ogbn-mag", root=root)
    split = dataset.get_idx_split()
    g, labels = dataset[0]
    edge_index_dict = {
        tuple(k): np.asarray(v) for k, v in g["edge_index_dict"].items()
    }
    num_nodes_dict = {k: int(v) for k, v in g["num_nodes_dict"].items()}
    grouped = mag_preprocess(edge_index_dict, num_nodes_dict)
    return MagDataset(
        grouped=grouped,
        x_paper=np.asarray(g["node_feat_dict"]["paper"], np.float32),
        y_paper=np.asarray(labels["paper"]).reshape(-1).astype(np.int32),
        split_idx={k: np.asarray(v["paper"]) for k, v in split.items()},
        num_classes=349,
        num_nodes_dict=num_nodes_dict,
        num_edge_types=7,
    )
