"""Edge-partitioned SpMM across a device mesh — the graph analog of
sequence/context parallelism (SURVEY.md section 2.5, the "core component"
row).

Partitioning scheme: receiver-sorted edges are split by destination row
range — device ``d`` owns output rows ``[d*rows, (d+1)*rows)`` and exactly
the edges pointing into them (contiguous in the receiver-sorted order, so
partitioning is a pure reshape of the edge stream). Node features are
row-sharded over the ``data`` mesh axis.

Communication: each device needs source-node features that live on other
shards. Two exchange strategies, both differentiable:

* ``spmm_sharded`` — one ``all_gather`` of the full feature matrix over ICI
  (bandwidth-optimal ring on TPU; fine when N*F fits every chip). The VJP
  automatically becomes a ``reduce_scatter`` of source-side gradients.
* ``spmm_halo`` — halo-compressed ``all_to_all``: each device ships only the
  *boundary* source rows its neighbors actually reference (index sets
  precomputed host-side once per graph and reused across layers/steps).
  Edges are split into local (source on-shard) and halo subsets so XLA can
  overlap the exchange with the local aggregation — the local segment-sum
  has no data dependence on the collective. The VJP reverses the
  ``all_to_all`` and scatter-adds halo gradients back to their owners.
  This is the pod-scale design: comm volume is |halo|*F per device, not N*F.

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


def _effective_edge_weight(graph: Graph) -> np.ndarray:
    """Per-edge weights with a factored node_scale folded in
    (``build_graph(gcn_norm="factored")`` graphs carry the symmetric
    normalization as diagonal scales, not per-edge values)."""
    w = (
        np.asarray(graph.edge_weight)
        if graph.edge_weight is not None
        else np.asarray(graph.edge_mask, np.float32)
    )
    if graph.node_scale is not None:
        scale = np.asarray(graph.node_scale)
        s = np.minimum(np.asarray(graph.senders), graph.num_nodes - 1)
        r = np.minimum(np.asarray(graph.receivers), graph.num_nodes - 1)
        w = w * scale[s] * scale[r]
    return w


def partition_graph(graph: Graph, num_devices: int) -> PartitionedGraph:
    """Split a receiver-sorted Graph into ``num_devices`` row partitions."""
    n = graph.num_nodes
    assert n % num_devices == 0, (
        f"pad num_nodes ({n}) to a multiple of the mesh size ({num_devices})"
    )
    rows = n // num_devices
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    w = _effective_edge_weight(graph)

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


class HaloPartition(NamedTuple):
    """Halo-compressed edge partition, stacked on a leading device axis.

    Device ``d`` owns output rows ``[d*rows, (d+1)*rows)``. Its edges are
    split by source ownership:

    s_local: int32[D, E_loc] shard-local source row (``rows`` for padding).
    r_local: int32[D, E_loc] shard-local destination row (sorted; ``rows``
      for padding).
    w_local: float32[D, E_loc].
    s_halo: int32[D, E_halo] index into the *received halo table*
      (``owner*H + position``; ``D*H`` for padding).
    r_halo / w_halo: as above for halo edges.
    send_idx: int32[D, D, H] — shard-local rows device ``d`` ships to each
      destination device (clipped-gather padding; self block unused).
    rows_per_dev / halo_width / num_nodes / num_devices: statics.
    """

    s_local: jnp.ndarray
    r_local: jnp.ndarray
    w_local: jnp.ndarray
    s_halo: jnp.ndarray
    r_halo: jnp.ndarray
    w_halo: jnp.ndarray
    send_idx: jnp.ndarray
    rows_per_dev: int
    halo_width: int
    num_nodes: int
    num_devices: int


def _pad_to(n: int, mult: int = 1024) -> int:
    return max(mult, ((n + mult - 1) // mult) * mult)


def partition_graph_halo(graph: Graph, num_devices: int) -> HaloPartition:
    """Build the halo-compressed partition (host-side, once per graph).

    For every (owner o, destination d) pair the boundary set is the sorted
    unique source rows of o referenced by d's halo edges; ``halo_width`` is
    the maximum boundary size so the ``all_to_all`` blocks are uniform.
    """
    n = graph.num_nodes
    d_count = num_devices
    assert n % d_count == 0, (
        f"pad num_nodes ({n}) to a multiple of the mesh size ({d_count})"
    )
    rows = n // d_count
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    w = _effective_edge_weight(graph)
    valid = receivers < n

    # per-device contiguous edge ranges (receiver-sorted)
    owner_r = np.minimum(receivers // rows, d_count - 1)
    counts = np.bincount(owner_r[valid], minlength=d_count)
    starts = np.zeros(d_count + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    # pass 1: boundary sets + edge split sizes
    need = [[None] * d_count for _ in range(d_count)]  # need[d][o] = rows of o
    n_loc = np.zeros(d_count, np.int64)
    n_halo = np.zeros(d_count, np.int64)
    for d in range(d_count):
        s = senders[starts[d]:starts[d + 1]]
        owner_s = s // rows
        local = owner_s == d
        n_loc[d] = int(local.sum())
        n_halo[d] = int(s.shape[0] - n_loc[d])
        for o in range(d_count):
            if o == d:
                continue
            need[d][o] = np.unique(s[owner_s == o])
    halo_w = max(
        [1] + [len(need[d][o]) for d in range(d_count) for o in range(d_count)
               if o != d]
    )
    halo_w = ((halo_w + 7) // 8) * 8
    e_loc = _pad_to(int(n_loc.max()))
    e_halo = _pad_to(int(n_halo.max()))

    s_loc = np.full((d_count, e_loc), rows, dtype=np.int32)
    r_loc = np.full((d_count, e_loc), rows, dtype=np.int32)
    w_loc = np.zeros((d_count, e_loc), dtype=np.float32)
    s_hal = np.full((d_count, e_halo), d_count * halo_w, dtype=np.int32)
    r_hal = np.full((d_count, e_halo), rows, dtype=np.int32)
    w_hal = np.zeros((d_count, e_halo), dtype=np.float32)
    send_idx = np.zeros((d_count, d_count, halo_w), dtype=np.int32)

    for d in range(d_count):
        lo, hi = starts[d], starts[d + 1]
        s = senders[lo:hi]
        r = receivers[lo:hi] - d * rows
        wv = w[lo:hi]
        owner_s = s // rows
        local = owner_s == d
        k = int(local.sum())
        s_loc[d, :k] = s[local] - d * rows
        r_loc[d, :k] = r[local]
        w_loc[d, :k] = wv[local]
        halo = ~local
        kh = int(halo.sum())
        # halo slot = owner*H + rank within the (sorted unique) boundary set
        sh = s[halo]
        oh = owner_s[halo]
        slot = np.zeros(kh, dtype=np.int64)
        for o in range(d_count):
            if o == d:
                continue
            rows_o = need[d][o]
            if rows_o is None or rows_o.size == 0:
                continue
            sel = oh == o
            slot[sel] = o * halo_w + np.searchsorted(rows_o, sh[sel])
            send_idx[o, d, :rows_o.size] = rows_o - o * rows
        s_hal[d, :kh] = slot
        r_hal[d, :kh] = r[halo]
        w_hal[d, :kh] = wv[halo]

    return HaloPartition(
        s_local=jnp.asarray(s_loc),
        r_local=jnp.asarray(r_loc),
        w_local=jnp.asarray(w_loc),
        s_halo=jnp.asarray(s_hal),
        r_halo=jnp.asarray(r_hal),
        w_halo=jnp.asarray(w_hal),
        send_idx=jnp.asarray(send_idx),
        rows_per_dev=rows,
        halo_width=halo_w,
        num_nodes=n,
        num_devices=d_count,
    )


def halo_stats(part: HaloPartition) -> dict:
    """Comm accounting: halo rows shipped vs the all_gather alternative."""
    d, rows = part.num_devices, part.rows_per_dev
    return {
        "halo_rows_per_device": (d - 1) * part.halo_width,
        "all_gather_rows_per_device": (d - 1) * rows,
        "compression": ((d - 1) * rows) / max(1, (d - 1) * part.halo_width),
    }


def spmm_halo(
    mesh: Mesh,
    part: HaloPartition,
    x: jnp.ndarray,
    axis: str = "data",
) -> jnp.ndarray:
    """Distributed ``out = A @ x`` shipping only boundary rows.

    Per device: gather the send blocks, ``all_to_all`` them over ICI, and
    aggregate local edges from the shard (no dependence on the collective —
    XLA overlaps the exchange with this segment-sum) plus halo edges from
    the received table. Autodiff reverses the collective and scatter-adds
    halo gradients back to their owner shards.
    """
    rows = part.rows_per_dev
    h = part.halo_width
    d_count = part.num_devices

    def local(x_shard, s_l, r_l, w_l, s_h, r_h, w_h, send_idx):
        # pad row so clipped/padding indices read zeros
        xp = jnp.concatenate([x_shard, jnp.zeros_like(x_shard[:1])], axis=0)
        send = jnp.take(xp, jnp.minimum(send_idx[0], rows), axis=0)  # [D, H, F]
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=True
        )  # [D, H, F]: block o = rows shipped by device o
        # local edges first: independent of the collective -> overlappable
        msgs_l = jnp.take(xp, jnp.minimum(s_l[0], rows), axis=0) * w_l[0][:, None]
        out = jax.ops.segment_sum(
            msgs_l, r_l[0], num_segments=rows, indices_are_sorted=True
        )
        table = jnp.concatenate(
            [recv.reshape(d_count * h, -1), jnp.zeros_like(x_shard[:1])], axis=0
        )
        msgs_h = jnp.take(
            table, jnp.minimum(s_h[0], d_count * h), axis=0
        ) * w_h[0][:, None]
        out = out + jax.ops.segment_sum(
            msgs_h, r_h[0], num_segments=rows, indices_are_sorted=True
        )
        return out

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis, None),
            P(axis, None), P(axis, None), P(axis, None),
            P(axis, None), P(axis, None), P(axis, None),
            P(axis, None, None),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(x, part.s_local, part.r_local, part.w_local,
              part.s_halo, part.r_halo, part.w_halo, part.send_idx)


def spmm_halo_2level(
    mesh: Mesh,
    part: HaloPartition,
    x: jnp.ndarray,
    host_axis: str = "host",
    chip_axis: str = "chip",
) -> jnp.ndarray:
    """Two-level halo exchange over a ``(host, chip)`` mesh — the DCN x ICI
    topology of a multi-host TPU pod.

    ``part`` is the flat :func:`partition_graph_halo` partition for
    ``H * C`` devices with host-major device order ``d = host * C + chip``
    (the row-shard order of ``P((host, chip), None)``). The boundary-row
    exchange is decomposed by link type:

    * **ICI** (fast, within a host): ONE ``all_to_all`` over ``chip_axis``
      redistributes the destination-chip dimension, so every chip ends up
      holding, per destination host, the blocks its whole host prepared for
      its own chip index.
    * **DCN** (slow, across hosts): ``H - 1`` ``ppermute`` ring steps over
      ``host_axis`` rotate those per-destination-host slabs to their hosts —
      each step moves only the rows actually crossing the host boundary
      (|halo| * F per host pair, never N * F), and the ring schedule keeps
      every DCN link busy with one slab per step.

    Autodiff reverses both collectives (the VJP ppermutes run the ring the
    other way), so the same function serves training. Numerically identical
    to :func:`spmm_halo` on the flat mesh — invariance-tested on the
    virtual CPU mesh (tests/test_parallel.py).
    """
    rows = part.rows_per_dev
    hw = part.halo_width
    d_count = part.num_devices
    hosts, chips = mesh.shape[host_axis], mesh.shape[chip_axis]
    assert hosts * chips == d_count, (mesh.shape, d_count)
    axis2 = (host_axis, chip_axis)

    def local(x_shard, s_l, r_l, w_l, s_h, r_h, w_h, send_idx):
        xp = jnp.concatenate([x_shard, jnp.zeros_like(x_shard[:1])], axis=0)
        # blocks for every destination device, [H, C, hw, F] host-major
        send = jnp.take(xp, jnp.minimum(send_idx[0], rows), axis=0)
        send = send.reshape(hosts, chips, hw, -1)
        # ICI stage: redistribute destination-chip dim within the host.
        # a2a[h', j] = block prepared by (my_host, chip j) for (h', my_chip)
        a2a = jax.lax.all_to_all(
            send, chip_axis, split_axis=1, concat_axis=1, tiled=True
        )
        my_h = jax.lax.axis_index(host_axis)
        # recv[h_src, c_src] = rows shipped by device (h_src, c_src) to me
        recv = jnp.zeros_like(a2a)
        own = jax.lax.dynamic_index_in_dim(a2a, my_h, axis=0, keepdims=True)
        recv = jax.lax.dynamic_update_slice_in_dim(recv, own, my_h, axis=0)
        for k in range(1, hosts):
            dest_h = jax.lax.rem(my_h + k, hosts)
            blk = jax.lax.dynamic_index_in_dim(
                a2a, dest_h, axis=0, keepdims=True
            )
            # DCN ring step k: host h -> host h+k; we receive host (h-k)'s
            # blocks destined for us
            got = jax.lax.ppermute(
                blk, host_axis,
                perm=[(i, (i + k) % hosts) for i in range(hosts)],
            )
            src_h = jax.lax.rem(my_h - k + hosts, hosts)
            recv = jax.lax.dynamic_update_slice_in_dim(recv, got, src_h, axis=0)

        # local edges overlap with both exchange stages
        msgs_l = jnp.take(xp, jnp.minimum(s_l[0], rows), axis=0) * w_l[0][:, None]
        out = jax.ops.segment_sum(
            msgs_l, r_l[0], num_segments=rows, indices_are_sorted=True
        )
        table = jnp.concatenate(
            [recv.reshape(d_count * hw, -1), jnp.zeros_like(x_shard[:1])],
            axis=0,
        )
        msgs_h = jnp.take(
            table, jnp.minimum(s_h[0], d_count * hw), axis=0
        ) * w_h[0][:, None]
        return out + jax.ops.segment_sum(
            msgs_h, r_h[0], num_segments=rows, indices_are_sorted=True
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis2, None),
            P(axis2, None), P(axis2, None), P(axis2, None),
            P(axis2, None), P(axis2, None), P(axis2, None),
            P(axis2, None, None),
        ),
        out_specs=P(axis2, None),
        check_vma=False,
    )
    return fn(x, part.s_local, part.r_local, part.w_local,
              part.s_halo, part.r_halo, part.w_halo, part.send_idx)
