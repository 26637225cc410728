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


def load_ogbn_arxiv(root: str = "dataset", hub_dense="auto",
                    gcn_norm: bool = True) -> NodeDataset:
    """ogbn-arxiv with Pallas blockings. GAT (attention) graphs pass
    ``gcn_norm=False`` so the hub slices hold multiplicities — required by
    the hub attention fast path (ops/hub_attention.py)."""
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "ogb is not installed; use --dataset synthetic (this environment "
            "has no network egress for downloads)"
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
