from efficient_gnns_tpu.graphs.container import Graph, BatchedGraphs
from efficient_gnns_tpu.graphs.hub_dense import (
    HubDense,
    build_hub_dense,
    hub_contribution,
    refresh_hub_weights,
)
from efficient_gnns_tpu.graphs.preprocess import (
    build_graph,
    to_bidirected,
    add_self_loops,
    gcn_norm_weights,
    pad_length,
)

__all__ = [
    "Graph",
    "BatchedGraphs",
    "HubDense",
    "build_hub_dense",
    "hub_contribution",
    "refresh_hub_weights",
    "build_graph",
    "to_bidirected",
    "add_self_loops",
    "gcn_norm_weights",
    "pad_length",
]
