"""SIGN hop-feature precompute.

Reference ``arxiv_dgl/sign.py:175-201`` (``neighbor_average_features``):
R rounds of ``update_all(copy_u, mean)`` — i.e. R in-neighbor-mean SpMM
passes — materializing ``feats[0..R]``. After this, SIGN training touches no
graph ops at all (the pure-MLP scalability path).

Each pass is one jitted ``spmm_mean``; at arxiv scale this runs entirely on
device and is the "HOT-once" kernel of the SIGN pipeline.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops import spmm_mean


def neighbor_average_features(
    graph: Graph, x: jnp.ndarray, num_hops: int
) -> List[jnp.ndarray]:
    """Returns ``[feat_0, feat_1, ..., feat_R]`` with R = num_hops.

    The graph rides as a jit *argument* (pytree), never a closure constant:
    baking multi-MB index arrays into the XLA program blows the
    remote-compile request limit on tunneled TPU backends (HTTP 413).
    """
    mean_pass = jax.jit(lambda g, f: spmm_mean(g, f))
    feats = [jnp.asarray(x)]
    for _ in range(num_hops):
        feats.append(mean_pass(graph, feats[-1]))
    return feats
