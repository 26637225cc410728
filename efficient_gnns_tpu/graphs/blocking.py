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
        (== E_pad for padding slots). Monotone increasing over real slots.
      src: int32[nb*EB] pre-gathered sender ids (0 for padding; masked by
        ``dst_local == TM``).
      dst_local: int32[nb, EB] destination row within the tile (TM for
        padding slots -> zero one-hot row).
      w_blk: optional float32[nb, EB] — the graph's *static* edge weights
        pre-permuted into the blocked layout at build time (0 for padding).
        Avoids the per-step scalar gather ``w[edge_id]``, which is
        latency-bound on TPU (~10 ns per random scalar — measured 20 ms for
        ogbn-arxiv's 2.1 M edges, vs. ~0 for this host-precomputed layout).
      tm: static row-tile size.
      eb: static edge-block size.
      num_tiles: static number of row tiles (= ceil(num_nodes / tm)).
    """

    tile_idx: jnp.ndarray
    first_flag: jnp.ndarray
    edge_id: jnp.ndarray
    src: jnp.ndarray
    dst_local: jnp.ndarray
    w_blk: jnp.ndarray = None
    # int32[nb*EB] slot -> index into the *canonical CSR* edge order (for the
    # transpose blocking this is csc_perm composed with edge_id, precomputed
    # host-side so runtime weight expansion never chains two scalar gathers).
    # None means edge_id already is the CSR mapping (forward blocking).
    csr_perm: jnp.ndarray = None
    # int32[num_edges_padded] inverse of the slot->CSR mapping: CSR edge id
    # -> blocked slot (padding slot for CSR ids without one). Lets per-edge
    # kernel outputs (e.g. attention weight gradients computed in blocked
    # order) return to CSR order with one cheap thin gather.
    inv_perm: jnp.ndarray = None
    # int32[nb*EB] (transpose blockings only): slot index into the *forward*
    # blocking holding the same edge. Lets the attention backward move
    # per-edge values (softmax probs, logit grads) from forward-blocked to
    # transpose-blocked order with ONE thin gather instead of two chained
    # CSR permutations (see ops/attention.py).
    cross_perm: jnp.ndarray = None
    tm: int = struct.field(pytree_node=False, default=256)
    eb: int = struct.field(pytree_node=False, default=512)
    num_tiles: int = struct.field(pytree_node=False, default=0)

    @property
    def num_blocks(self) -> int:
        return self.tile_idx.shape[0]


def choose_eb(
    receivers: np.ndarray, num_nodes: int, tm: int = 256,
    candidates=(512, 1024, 2048, 4096),
) -> int:
    """Pick the edge-block size minimizing estimated scatter time.

    Cost model: ``slots + OVERHEAD * num_blocks`` — each padded slot costs
    one unit of VPU/MXU/HBM work, and each block (sequential grid step)
    costs a fixed overhead. OVERHEAD=400 calibrated on TPU v5e (ogbn-arxiv
    scatter: eb=512 -> 5.1 ms, eb=1024 -> 4.2 ms, eb=2048 -> 3.6 ms, i.e.
    ~0.5 us per grid step vs ~1.2 ns per slot).
    """
    OVERHEAD = 400
    valid = receivers < num_nodes
    r = np.asarray(receivers)[valid]
    num_tiles = -(-num_nodes // tm)
    counts = np.bincount(r // tm, minlength=num_tiles)
    best_eb, best_cost = None, None
    for eb in candidates:
        nb = int(np.maximum(1, -(-counts // eb)).sum())
        cost = nb * eb + OVERHEAD * nb
        if best_cost is None or cost < best_cost or (
            cost == best_cost and eb > best_eb
        ):
            best_eb, best_cost = eb, cost
    return best_eb


def attach_blocking(graph, tm: int = 256, eb: int = None):
    """Attach forward + transpose edge blockings to a Graph.

    Note: pulls index arrays to the host; when building graphs from scratch
    prefer ``build_graph(..., block=True)`` which blocks before upload
    (device->host readback through a TPU tunnel can dominate otherwise).
    """
    if graph.hub is not None:
        raise ValueError(
            "graph carries a hub-dense decomposition whose blockings cover "
            "only residual edges; re-blocking the full edge list would "
            "double-count the hub edges. Rebuild with build_graph(block=True)."
        )
    receivers = np.asarray(graph.receivers)
    if eb is None:
        eb = choose_eb(receivers, graph.num_nodes, tm)
    w = None if graph.edge_weight is None else np.asarray(graph.edge_weight)
    blk = build_blocking(
        np.asarray(graph.senders), receivers,
        graph.num_nodes, graph.num_edges_padded, tm=tm, eb=eb,
        edge_weight=w,
    )
    csc_perm = np.asarray(graph.csc_perm)
    tblk = build_blocking(
        np.asarray(graph.t_senders), np.asarray(graph.t_receivers),
        graph.num_nodes, graph.num_edges_padded, tm=tm, eb=eb,
        edge_weight=None if w is None else w[np.minimum(csc_perm, w.shape[0] - 1)],
        order_to_csr=csc_perm,
    )
    tblk = attach_cross_perm(blk, tblk, graph.num_edges_padded)
    return graph.replace(blocking=blk, t_blocking=tblk)


def attach_cross_perm(blocking: EdgeBlocking, t_blocking: EdgeBlocking,
                      num_edges_padded: int) -> EdgeBlocking:
    """Returns ``t_blocking`` with ``cross_perm`` filled: for every transpose
    slot, the forward-blocking slot holding the same edge (a padding slot of
    the forward blocking for transpose padding slots). One-time device
    gather — NO host readback (index arrays may already live behind a TPU
    tunnel where readback dominates build time).
    """
    inv = blocking.inv_perm
    t_map = (
        t_blocking.csr_perm if t_blocking.csr_perm is not None
        else t_blocking.edge_id
    )
    cross = jnp.take(inv, jnp.minimum(t_map, inv.shape[0] - 1), mode="clip")
    return t_blocking.replace(cross_perm=cross.astype(jnp.int32))


def _pre_block_weights(
    edge_weight: np.ndarray, edge_id: np.ndarray, dst_local: np.ndarray,
    num_edges_padded: int, nb: int, eb: int, tm: int,
) -> np.ndarray:
    w_blk = np.zeros(nb * eb, dtype=np.float32)
    real = dst_local.reshape(-1) < tm
    w_blk[real] = np.asarray(edge_weight, np.float32)[
        np.minimum(edge_id[real], num_edges_padded - 1)
    ]
    return w_blk.reshape(nb, eb)


def _reblock(blocking: EdgeBlocking, w_csr: jnp.ndarray, e_pad: int) -> EdgeBlocking:
    mapping = blocking.csr_perm if blocking.csr_perm is not None else blocking.edge_id
    nb, eb, tm = blocking.num_blocks, blocking.eb, blocking.tm
    eid = jnp.minimum(mapping, e_pad - 1).reshape(nb, eb)
    w_blk = jnp.where(
        blocking.dst_local < tm, w_csr.astype(jnp.float32)[eid], 0.0
    )
    return blocking.replace(w_blk=w_blk)


def attach_blocked_weights(graph):
    """Refresh every static-weight cache from ``graph.edge_weight``:
    ``w_blk`` on both blockings and the hub-dense slices (if present).

    One-time per graph (a scalar gather is latency-bound on TPU, ~20 ms for
    2M edges — fine at build time, fatal per training step; the blocked
    SpMM path never re-permutes weights at runtime).
    """
    if graph.blocking is None or graph.edge_weight is None:
        return graph
    e_pad = graph.num_edges_padded
    w = graph.edge_weight
    tblk = graph.t_blocking
    w_for_t = w if tblk.csr_perm is not None else w[graph.csc_perm]
    hub = graph.hub
    if hub is not None:
        from efficient_gnns_tpu.graphs.hub_dense import refresh_hub_weights

        hub = refresh_hub_weights(hub, w)
    return graph.replace(
        blocking=_reblock(graph.blocking, w, e_pad),
        t_blocking=_reblock(tblk, w_for_t, e_pad),
        hub=hub,
    )


def _compose_csr_perm(
    order_to_csr: np.ndarray, edge_id: np.ndarray, num_edges_padded: int,
) -> np.ndarray:
    perm = np.full(edge_id.shape[0], num_edges_padded, dtype=np.int32)
    real = edge_id < num_edges_padded
    perm[real] = order_to_csr[edge_id[real]]
    return perm


def _inverse_perm(
    mapping: np.ndarray, dst_local_flat: np.ndarray, tm: int,
    num_edges_padded: int,
) -> np.ndarray:
    """int32[num_edges_padded]: CSR edge id -> blocked slot index.

    CSR ids without a slot (only possible on hub-decomposed graphs, whose
    runtime-weight paths are disabled anyway) and padded CSR ids point at a
    padding slot, whose kernel outputs are zero by construction.
    """
    real = dst_local_flat < tm
    pad_slots = np.nonzero(~real)[0]
    pad_slot = int(pad_slots[0]) if pad_slots.size else 0
    inv = np.full(num_edges_padded, pad_slot, dtype=np.int32)
    m = mapping[real]
    ok = m < num_edges_padded
    inv[m[ok]] = np.nonzero(real)[0][ok]
    return inv


def max_blocks(num_nodes: int, num_edges_padded: int, tm: int, eb: int) -> int:
    """Upper bound on the block count of ANY edge list with these budgets:
    every row tile owns at least one (possibly partial) block, and at most
    ``ceil(E_pad / eb)`` further blocks are fully packed. Use as
    ``pad_blocks_to`` to give samplers a sample-independent static shape."""
    num_tiles = -(-num_nodes // tm)
    return num_tiles + -(-num_edges_padded // eb)


def build_blocking(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    num_edges_padded: int,
    tm: int = 256,
    eb: int = 512,
    edge_weight: np.ndarray = None,
    order_to_csr: np.ndarray = None,
    pad_blocks_to: int = None,
    max_dst_row: int = None,
) -> EdgeBlocking:
    """Blocks a receiver-sorted (possibly padded) edge list.

    ``senders``/``receivers`` are the padded device arrays of the Graph
    (padding receivers == num_nodes); padding edges are excluded from blocks.
    ``edge_weight`` (host array, same order as ``senders``) is pre-permuted
    into the blocked layout (see ``EdgeBlocking.w_blk``). ``order_to_csr``
    maps this edge order to the canonical CSR order (pass the csc
    permutation when blocking the transpose graph).

    ``pad_blocks_to``: pad the block count to a static value with all-padding
    blocks appended after the last tile's blocks (``first_flag=0``, same
    ``tile_idx`` — the resident output tile re-accumulates zeros, a no-op for
    the scatter kernel). The block count is otherwise data-dependent, which
    would retrace a jitted step for every sampled subgraph; samplers pass
    :func:`max_blocks` here.

    ``max_dst_row``: promise that every real receiver is ``< max_dst_row``.
    Row tiles at or beyond ``ceil(max_dst_row / tm)`` then get NO blocks (not
    even the one empty-tile padding block), shrinking the arrays sharply for
    tall-but-narrow layouts (the relation-typed square graph: ``R * N`` rows,
    receivers only in ``[0, N)``). Output rows ``>= ceil(max_dst_row/tm)*tm``
    of the scatter are then UNINITIALIZED — callers must slice them off
    (the typed R-GCN path slices to ``[:N]``).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    valid = receivers < num_nodes
    e = int(valid.sum())
    num_tiles = -(-num_nodes // tm)

    from efficient_gnns_tpu.native import host as _native

    used_tiles = num_tiles
    if max_dst_row is not None:
        if e and int(receivers[valid].max()) >= max_dst_row:
            raise ValueError("edges violate the max_dst_row promise")
        used_tiles = max(1, min(num_tiles, -(-int(max_dst_row) // tm)))

    arrays = _native.blocking_arrays(
        senders, receivers, num_nodes, num_edges_padded, tm, eb
    )
    if arrays is not None:  # C++ builder (native/gnns_host.cc)
        tile_idx, first_flag, edge_id, src, dst_local = arrays
        dst_local = np.asarray(dst_local).reshape(-1)
        if used_tiles < num_tiles:
            # drop the per-empty-tile padding blocks beyond the promised
            # receiver range (no real edges can live there)
            keep = tile_idx < used_tiles
            tile_idx = tile_idx[keep]
            first_flag = first_flag[keep]
            slot_keep = np.repeat(keep, eb)
            edge_id = edge_id[slot_keep]
            src = src[slot_keep]
            dst_local = dst_local[slot_keep]
    else:
        r = receivers[:e]
        # per-tile edge counts (edges sorted by receiver => contiguous/tile)
        tile_of_edge = r // tm
        counts = np.bincount(tile_of_edge, minlength=num_tiles)
        blocks_per_tile = np.maximum(1, -(-counts // eb))
        if used_tiles < num_tiles:
            blocks_per_tile[used_tiles:] = 0
        nb = int(blocks_per_tile.sum())

        tile_idx = np.repeat(
            np.arange(num_tiles, dtype=np.int32), blocks_per_tile
        )
        first_flag = np.zeros(nb, dtype=np.int32)
        starts_f = (np.cumsum(blocks_per_tile) - blocks_per_tile)[
            blocks_per_tile > 0
        ]
        first_flag[starts_f] = 1

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

    nb = tile_idx.shape[0]
    if pad_blocks_to is not None:
        if nb > pad_blocks_to:
            raise ValueError(
                f"blocking produced {nb} blocks > pad_blocks_to="
                f"{pad_blocks_to}; raise the budget (see max_blocks)"
            )
        if nb < pad_blocks_to:
            extra = pad_blocks_to - nb
            last_tile = int(tile_idx[-1]) if nb else 0
            tile_idx = np.concatenate([
                tile_idx,
                np.full(extra, last_tile, dtype=np.int32),
            ])
            first_flag = np.concatenate(
                [first_flag, np.zeros(extra, dtype=np.int32)]
            )
            edge_id = np.concatenate([
                edge_id, np.full(extra * eb, num_edges_padded, dtype=np.int32)
            ])
            src = np.concatenate([src, np.zeros(extra * eb, dtype=np.int32)])
            dst_local = np.concatenate(
                [dst_local, np.full(extra * eb, tm, dtype=np.int32)]
            )
            nb = pad_blocks_to

    w_blk = None
    if edge_weight is not None:
        w_blk = jnp.asarray(_pre_block_weights(
            edge_weight, edge_id, dst_local, num_edges_padded, nb, eb, tm
        ))
    csr_perm = None
    mapping = edge_id
    if order_to_csr is not None:
        mapping = _compose_csr_perm(order_to_csr, edge_id, num_edges_padded)
        csr_perm = jnp.asarray(mapping)
    inv = _inverse_perm(mapping, dst_local, tm, num_edges_padded)

    return EdgeBlocking(
        tile_idx=jnp.asarray(tile_idx),
        first_flag=jnp.asarray(first_flag),
        edge_id=jnp.asarray(edge_id),
        src=jnp.asarray(src),
        dst_local=jnp.asarray(dst_local.reshape(nb, eb)),
        w_blk=w_blk,
        csr_perm=csr_perm,
        inv_perm=jnp.asarray(inv),
        tm=tm,
        eb=eb,
        num_tiles=num_tiles,
    )
