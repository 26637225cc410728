"""Edge blocking for the Pallas segment-matmul scatter kernel.

The TPU-native scatter: receiver-sorted edges are partitioned into fixed
blocks of ``EB`` edges, each block owned by exactly one output *row tile* of
``TM`` destination rows. The kernel turns each block's local destination ids
into a one-hot matrix and accumulates ``onehot^T @ messages`` on the MXU —
replacing XLA's serialized scatter-add with dense matmuls
(measured ~4-10x faster at ogbn-arxiv scale; see bench.py).

Because edges are already receiver-sorted, blocking only inserts padding at
row-tile boundaries (~5-10% extra edges at EB=512/TM=256 for arxiv-like
degree distributions). Tiles with no edges get one all-padding block so
every output tile is initialized.

Built host-side once per graph; arrays ride in the Graph pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EdgeBlocking:
    """Device arrays describing the blocked edge layout.

    Attributes:
      tile_idx: int32[nb] output row-tile index of each block (ascending).
      first_flag: int32[nb] 1 iff the block is its tile's first block.
      edge_id: int32[nb*EB] index into the receiver-sorted edge arrays
        (== E_pad for padding slots).
      src: int32[nb*EB] pre-gathered sender ids (0 for padding; masked by
        ``dst_local == TM``).
      dst_local: int32[nb, EB] destination row within the tile (TM for
        padding slots -> zero one-hot row).
      tm: static row-tile size.
      eb: static edge-block size.
      num_tiles: static number of row tiles (= ceil(num_nodes / tm)).
    """

    tile_idx: jnp.ndarray
    first_flag: jnp.ndarray
    edge_id: jnp.ndarray
    src: jnp.ndarray
    dst_local: jnp.ndarray
    tm: int = struct.field(pytree_node=False, default=256)
    eb: int = struct.field(pytree_node=False, default=512)
    num_tiles: int = struct.field(pytree_node=False, default=0)

    @property
    def num_blocks(self) -> int:
        return self.tile_idx.shape[0]


def attach_blocking(graph, tm: int = 256, eb: int = 512):
    """Attach forward + transpose edge blockings to a Graph.

    Note: pulls index arrays to the host; when building graphs from scratch
    prefer ``build_graph(..., block=True)`` which blocks before upload
    (device->host readback through a TPU tunnel can dominate otherwise).
    """
    blk = build_blocking(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        graph.num_nodes, graph.num_edges_padded, tm=tm, eb=eb,
    )
    tblk = build_blocking(
        np.asarray(graph.t_senders), np.asarray(graph.t_receivers),
        graph.num_nodes, graph.num_edges_padded, tm=tm, eb=eb,
    )
    return graph.replace(blocking=blk, t_blocking=tblk)


def build_blocking(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_edges_padded: int,
    tm: int = 256,
    eb: int = 512,
) -> EdgeBlocking:
    """Blocks a receiver-sorted (possibly padded) edge list.

    ``senders``/``receivers`` are the padded device arrays of the Graph
    (padding receivers == num_nodes); padding edges are excluded from blocks.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    valid = receivers < num_nodes
    e = int(valid.sum())
    num_tiles = -(-num_nodes // tm)

    from efficient_gnns_tpu.native import host as _native

    arrays = _native.blocking_arrays(
        senders, receivers, num_nodes, num_edges_padded, tm, eb
    )
    if arrays is not None:  # C++ builder (native/gnns_host.cc)
        tile_idx, first_flag, edge_id, src, dst_local = arrays
        return EdgeBlocking(
            tile_idx=jnp.asarray(tile_idx),
            first_flag=jnp.asarray(first_flag),
            edge_id=jnp.asarray(edge_id),
            src=jnp.asarray(src),
            dst_local=jnp.asarray(dst_local),
            tm=tm,
            eb=eb,
            num_tiles=num_tiles,
        )

    r = receivers[:e]
    # per-tile edge counts (edges sorted by receiver => contiguous per tile)
    tile_of_edge = r // tm
    counts = np.bincount(tile_of_edge, minlength=num_tiles)
    blocks_per_tile = np.maximum(1, -(-counts // eb))
    nb = int(blocks_per_tile.sum())

    tile_idx = np.repeat(np.arange(num_tiles, dtype=np.int32), blocks_per_tile)
    first_flag = np.zeros(nb, dtype=np.int32)
    first_flag[np.cumsum(blocks_per_tile) - blocks_per_tile] = 1

    edge_id = np.full(nb * eb, num_edges_padded, dtype=np.int32)
    dst_local = np.full(nb * eb, tm, dtype=np.int32)
    edge_starts = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(counts, out=edge_starts[1:])
    block_start = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(blocks_per_tile, out=block_start[1:])
    for t in range(num_tiles):
        cnt = counts[t]
        if cnt == 0:
            continue
        src_lo = edge_starts[t]
        dst_lo = block_start[t] * eb
        edge_id[dst_lo : dst_lo + cnt] = np.arange(src_lo, src_lo + cnt)
        dst_local[dst_lo : dst_lo + cnt] = r[src_lo : src_lo + cnt] - t * tm

    src = np.zeros(nb * eb, dtype=np.int32)
    has = dst_local < tm
    src[has] = senders[edge_id[has]]

    return EdgeBlocking(
        tile_idx=jnp.asarray(tile_idx),
        first_flag=jnp.asarray(first_flag),
        edge_id=jnp.asarray(edge_id),
        src=jnp.asarray(src),
        dst_local=jnp.asarray(dst_local.reshape(nb, eb)),
        tm=tm,
        eb=eb,
        num_tiles=num_tiles,
    )
