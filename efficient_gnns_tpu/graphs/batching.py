"""Pad-and-mask graph batching for inductive / graph-classification work.

Replaces the reference's per-graph PyTorch DataLoaders (PPI:
``ppi_pyg/gnn.py:305-310``, batch=1; molhiv batching is PyG ``Batch``) with
static-shape packing: a batch of molecules/graphs becomes ONE padded
:class:`Graph` whose node ids are offset per segment, so a single jitted
train step covers every batch without recompilation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import BatchedGraphs, Graph
from efficient_gnns_tpu.graphs.preprocess import build_graph, pad_length


def pack_graphs(
    graphs: Sequence[Tuple[np.ndarray, np.ndarray, int]],
    *,
    pad_nodes_to: int,
    pad_edges_to: int,
    pad_graphs_to: Optional[int] = None,
    edge_payloads: Optional[Sequence[np.ndarray]] = None,
    self_loops: bool = False,
) -> Tuple[BatchedGraphs, np.ndarray, Optional[np.ndarray]]:
    """Pack ``(senders, receivers, num_nodes)`` triples into one padded batch.

    Returns ``(batch, node_offsets, packed_payloads)``:
      * ``node_offsets[k]`` is the node-id offset of graph k (for packing
        node feature matrices with ``np.concatenate`` + zero padding);
      * ``packed_payloads`` is the per-edge payload matrix re-sorted into the
        packed graph's receiver-sorted edge order (None if not supplied).

    Node ranges are contiguous per graph, so global receiver-sorting keeps
    graphs contiguous and ``node_graph_ids`` ascending (sorted segment ops).
    """
    num_graphs = len(graphs)
    g_pad = pad_graphs_to or num_graphs
    if g_pad < num_graphs:
        raise ValueError("pad_graphs_to too small")

    offsets = np.zeros(num_graphs + 1, dtype=np.int64)
    for k, (_, _, n) in enumerate(graphs):
        offsets[k + 1] = offsets[k] + n
    total_nodes = int(offsets[-1])
    if pad_nodes_to < total_nodes:
        raise ValueError(f"pad_nodes_to={pad_nodes_to} < total nodes {total_nodes}")

    senders = np.concatenate(
        [np.asarray(s, np.int64) + offsets[k] for k, (s, _, _) in enumerate(graphs)]
    )
    receivers = np.concatenate(
        [np.asarray(r, np.int64) + offsets[k] for k, (_, r, _) in enumerate(graphs)]
    )
    payload = None
    if edge_payloads is not None:
        payload = np.concatenate([np.asarray(p) for p in edge_payloads], axis=0)

    if self_loops:
        loop = np.arange(total_nodes, dtype=np.int64)
        if payload is not None:
            raise ValueError("self_loops with edge payloads unsupported")
        senders = np.concatenate([senders, loop])
        receivers = np.concatenate([receivers, loop])

    if payload is not None:
        # replicate build_graph's receiver-sorted ordering for the payload
        order = np.lexsort((senders, receivers))
        packed_payload = np.zeros((pad_edges_to,) + payload.shape[1:], payload.dtype)
        packed_payload[: order.shape[0]] = payload[order]
    else:
        packed_payload = None

    graph = build_graph(
        senders,
        receivers,
        total_nodes,
        pad_nodes_to=pad_nodes_to,
        pad_edges_to=pad_edges_to,
        n_node_valid=total_nodes,
    )

    node_graph_ids = np.full(pad_nodes_to, g_pad, dtype=np.int32)
    for k in range(num_graphs):
        node_graph_ids[offsets[k] : offsets[k + 1]] = k

    batch = BatchedGraphs(
        graph=graph,
        node_graph_ids=jnp.asarray(node_graph_ids),
        n_graph=jnp.asarray(num_graphs, jnp.int32),
        num_graphs=g_pad,
    )
    return batch, offsets, packed_payload


def pack_node_features(
    feats: Sequence[np.ndarray], pad_nodes_to: int
) -> np.ndarray:
    """Concatenate per-graph node feature matrices and zero-pad rows."""
    cat = np.concatenate([np.asarray(f) for f in feats], axis=0)
    out = np.zeros((pad_nodes_to,) + cat.shape[1:], cat.dtype)
    out[: cat.shape[0]] = cat
    return out
