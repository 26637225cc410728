from efficient_gnns_tpu.graphs.container import Graph, BatchedGraphs
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
    "build_graph",
    "to_bidirected",
    "add_self_loops",
    "gcn_norm_weights",
    "pad_length",
]
