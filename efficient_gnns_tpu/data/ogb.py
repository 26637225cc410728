"""OGB dataset loaders (gated — the ``ogb`` package and a cached download
must exist; this environment has no network egress).

Reproduces the reference preprocessing:
* ogbn-arxiv: ``ToSparseTensor`` + ``to_symmetric`` (``arxiv_pyg/gnn.py:236-241``)
  == bidirection; the DGL teacher additionally adds self loops
  (``arxiv_dgl/gat.py:56-71``) — both handled by the shared graph builder.
"""

from __future__ import annotations

import numpy as np

from efficient_gnns_tpu.data.synthetic import NodeDataset
from efficient_gnns_tpu.graphs.preprocess import build_graph


def _load_arxiv_raw(root: str):
    """Read the ogbn-arxiv raw csv.gz cache directly (no ``ogb`` package):
    the files ``NodePropPredDataset`` downloads under ``ogbn_arxiv/raw`` +
    ``split/time``. Returns (s, r, num_nodes, x, y, split_idx) or None when
    the cache is absent."""
    import os

    base = root
    if os.path.isdir(os.path.join(root, "ogbn_arxiv")):
        base = os.path.join(root, "ogbn_arxiv")
    raw = os.path.join(base, "raw")
    split_dir = os.path.join(base, "split", "time")
    needed = [os.path.join(raw, f) for f in
              ("edge.csv.gz", "node-feat.csv.gz", "node-label.csv.gz")]
    needed += [os.path.join(split_dir, f"{s}.csv.gz")
               for s in ("train", "valid", "test")]
    if any(not os.path.exists(p) for p in needed):
        return None

    import pandas as pd

    def csv(path):
        return pd.read_csv(path, header=None).to_numpy()

    edges = csv(os.path.join(raw, "edge.csv.gz")).astype(np.int64)
    x = csv(os.path.join(raw, "node-feat.csv.gz")).astype(np.float32)
    y = csv(os.path.join(raw, "node-label.csv.gz")).reshape(-1).astype(np.int32)
    split_idx = {
        k: csv(os.path.join(split_dir, f"{k}.csv.gz")).reshape(-1).astype(np.int64)
        for k in ("train", "valid", "test")
    }
    return edges[:, 0], edges[:, 1], x.shape[0], x, y, split_idx


def load_ogbn_arxiv(root: str = "dataset", hub_dense="auto",
                    gcn_norm: bool = True) -> NodeDataset:
    """ogbn-arxiv with Pallas blockings. GAT (attention) graphs pass
    ``gcn_norm=False`` so the hub slices hold multiplicities — required by
    the hub attention fast path (ops/hub_attention.py).

    Data source: the ``ogb`` package when importable, otherwise a direct
    reader of the pre-mounted raw cache (``ogbn_arxiv/raw/*.csv.gz`` +
    ``split/time`` — no torch/ogb dependency)."""
    raw = _load_arxiv_raw(root)
    if raw is not None:
        s, r, num_nodes, x, y, split_idx = raw
    else:
        try:
            from ogb.nodeproppred import NodePropPredDataset
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise RuntimeError(
                f"neither an ogbn-arxiv raw cache under {root!r} nor the "
                "ogb package is available; use --dataset synthetic (this "
                "environment has no network egress for downloads)"
            ) from e

        dataset = NodePropPredDataset(name="ogbn-arxiv", root=root)
        split_idx = dataset.get_idx_split()
        graph_dict, labels = dataset[0]
        s = graph_dict["edge_index"][0]
        r = graph_dict["edge_index"][1]
        num_nodes = int(graph_dict["num_nodes"])
        x = graph_dict["node_feat"].astype(np.float32)
        y = labels.reshape(-1).astype(np.int32)

    graph = build_graph(
        s, r, num_nodes, bidirected=True, self_loops=True,
        block=True, hub_dense=hub_dense, gcn_norm=gcn_norm,
    )
    return NodeDataset(
        graph=graph,
        x=x,
        y=y,
        split_idx={k: np.sort(np.asarray(v)).astype(np.int32)
                   for k, v in split_idx.items()},
        num_classes=40,
        senders=np.asarray(s),
        receivers=np.asarray(r),
        num_nodes=num_nodes,
    )
