"""Edge-partitioned SpMM across a device mesh — the graph analog of
sequence/context parallelism (SURVEY.md section 2.5, the "core component"
row).

Partitioning scheme: receiver-sorted edges are split by destination row
range — device ``d`` owns output rows ``[d*rows, (d+1)*rows)`` and exactly
the edges pointing into them (contiguous in the receiver-sorted order, so
partitioning is a pure reshape of the edge stream). Node features are
row-sharded over the ``data`` mesh axis.

Communication: each device needs source-node features that live on other
shards. This implementation exchanges them with one ``all_gather`` over ICI
(bandwidth-optimal ring on TPU); the VJP automatically becomes a
``reduce_scatter`` of the source-side gradients. A halo-compressed
``all_to_all`` variant (ship only needed rows) is the planned refinement for
multi-host scale where |halo| << N.

All functions here are shard_map-based and differentiable; the partition
invariance property (N-shard result == 1-chip result) is tested on the
virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from efficient_gnns_tpu.graphs.container import Graph


class PartitionedGraph(NamedTuple):
    """Per-device edge partition, stacked on a leading device axis.

    senders: int32[D, E_pad] global source ids (N for padding).
    receivers_local: int32[D, E_pad] destination row *within the shard*
      (== rows_per_dev for padding).
    edge_weight: float32[D, E_pad].
    rows_per_dev: static shard height (num_nodes_padded / D).
    num_nodes: static padded global node count.
    num_devices: static D.
    """

    senders: jnp.ndarray
    receivers_local: jnp.ndarray
    edge_weight: jnp.ndarray
    rows_per_dev: int
    num_nodes: int
    num_devices: int


def partition_graph(graph: Graph, num_devices: int) -> PartitionedGraph:
    """Split a receiver-sorted Graph into ``num_devices`` row partitions."""
    n = graph.num_nodes
    assert n % num_devices == 0, (
        f"pad num_nodes ({n}) to a multiple of the mesh size ({num_devices})"
    )
    rows = n // num_devices
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    w = (
        np.asarray(graph.edge_weight)
        if graph.edge_weight is not None
        else np.asarray(graph.edge_mask, np.float32)
    )

    valid = receivers < n
    owner = np.minimum(receivers // rows, num_devices - 1)
    counts = np.bincount(owner[valid], minlength=num_devices)
    e_pad = ((int(counts.max()) + 1023) // 1024) * 1024 if counts.max() else 1024

    s_out = np.full((num_devices, e_pad), n, dtype=np.int32)
    r_out = np.full((num_devices, e_pad), rows, dtype=np.int32)
    w_out = np.zeros((num_devices, e_pad), dtype=np.float32)
    # receiver-sorted => per-device edges are contiguous
    starts = np.zeros(num_devices + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    for d in range(num_devices):
        lo, hi = starts[d], starts[d + 1]
        cnt = hi - lo
        s_out[d, :cnt] = senders[lo:hi]
        r_out[d, :cnt] = receivers[lo:hi] - d * rows
        w_out[d, :cnt] = w[lo:hi]

    return PartitionedGraph(
        senders=jnp.asarray(s_out),
        receivers_local=jnp.asarray(r_out),
        edge_weight=jnp.asarray(w_out),
        rows_per_dev=rows,
        num_nodes=n,
        num_devices=num_devices,
    )


def spmm_sharded(
    mesh: Mesh,
    part: PartitionedGraph,
    x: jnp.ndarray,
    axis: str = "data",
) -> jnp.ndarray:
    """Distributed ``out = A @ x`` with x row-sharded over ``axis``.

    Forward: all_gather(x) over ICI -> local gather -> local sorted
    segment-sum into the shard's rows. Backward (via autodiff through the
    collective): local transpose scatter -> reduce_scatter of source grads.
    """
    rows = part.rows_per_dev

    def local(x_shard, s, r, w):
        xg = jax.lax.all_gather(x_shard, axis, axis=0, tiled=True)  # [N, F]
        xg = jnp.concatenate([xg, jnp.zeros_like(xg[:1])], axis=0)  # pad row
        msgs = xg[s[0]] * w[0][:, None]
        return jax.ops.segment_sum(
            msgs, r[0], num_segments=rows, indices_are_sorted=True
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(x, part.senders, part.receivers_local, part.edge_weight)
