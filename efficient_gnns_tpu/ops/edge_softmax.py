"""Edge softmax — attention normalization over incoming edges.

TPU-native equivalent of DGL's ``edge_softmax`` including the *edge subset*
variant used by GAT edge-drop: the reference permutes edge ids and softmaxes
only the kept edges (``arxiv_dgl/models.py:207-214``) — masking happens
*before* normalization, which ``keep_mask`` reproduces here.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops.segment import segment_softmax


def edge_softmax(
    graph: Graph,
    logits: jnp.ndarray,
    keep_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax of per-edge logits grouped by receiver node.

    Args:
      logits: float[E_pad] or float[E_pad, H] (multi-head) attention logits
        in receiver-sorted edge order.
      keep_mask: optional bool[E_pad]; edges with False are excluded from the
        normalization entirely (probability 0) — GAT edge-drop semantics.

    Returns:
      Probabilities of the same shape; padded edges get 0.
    """
    mask = graph.edge_mask
    if keep_mask is not None:
        mask = jnp.logical_and(mask, keep_mask)
    if logits.ndim > 1:
        mask = mask.reshape(mask.shape + (1,) * (logits.ndim - 1))
        mask = jnp.broadcast_to(mask, logits.shape)
    return segment_softmax(logits, graph.receivers, graph.num_nodes, mask)
