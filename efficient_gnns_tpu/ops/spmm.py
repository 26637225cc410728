"""Sparse matrix x dense matrix products over :class:`Graph` adjacency.

Replaces the reference's native SpMM floor — DGL ``update_all(u_mul_e, sum)``
(``arxiv_dgl/models.py:217``), torch-sparse ``SparseTensor.matmul``
(``mag_pyg/gnn.py:149-163``) and the scatter engine inside PyG convs — with a
gather + *sorted* segment-sum formulation that XLA compiles to deterministic
TPU code.

Why a custom VJP: differentiating gather-then-scatter naively yields an
*unsorted* scatter-add into the node dimension. The gradient of an SpMM is an
SpMM over the transposed graph, and :class:`Graph` stores the sender-sorted
(CSC) edge order precisely so the backward pass is also a sorted segment sum
(the DGL ``create_formats_`` trick, reference ``arxiv_dgl/gat.py:69``).

Both forward and backward accumulate in float32 regardless of input dtype
(bfloat16 features are fine; long reductions are not done in bf16).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops.segment import float0_like, gather, segment_sum


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def _spmm(
    x,
    w,
    senders,
    receivers,
    t_senders,
    t_receivers,
    csc_perm,
    row_offsets,
    num_nodes: int,
):
    out_dtype = x.dtype
    msgs = gather(x, senders).astype(jnp.float32) * w[:, None].astype(jnp.float32)
    out = segment_sum(msgs, receivers, num_nodes, indices_are_sorted=True)
    return out.astype(out_dtype)


def _spmm_fwd(x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets, num_nodes):
    out = _spmm(x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets, num_nodes)
    return out, (x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets)


def _spmm_bwd(num_nodes, res, g):
    x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets = res
    gf = g.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    # dX = A^T @ (G * w): per-edge message g[receiver]*w, re-sorted into the
    # sender-sorted (transpose) order so the scatter is again sorted.
    msgs = gather(gf, receivers) * wf[:, None]
    dx = segment_sum(
        msgs[csc_perm], t_receivers, num_nodes, indices_are_sorted=True
    ).astype(x.dtype)

    # dW = SDDMM row-dot <g[receiver], x[sender]> (GAT attention gradients).
    valid = receivers < num_nodes
    dw = jnp.sum(gather(gf, receivers) * gather(x, senders).astype(jnp.float32), axis=-1)
    dw = jnp.where(valid, dw, 0.0).astype(w.dtype)

    return (
        dx,
        dw,
        float0_like(senders),
        float0_like(receivers),
        float0_like(t_senders),
        float0_like(t_receivers),
        float0_like(csc_perm),
        float0_like(row_offsets),
    )


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Pallas blocked path: scatter as one-hot MXU matmuls (ops/pallas/)
# ---------------------------------------------------------------------------


def _pad_features(a: jnp.ndarray):
    f = a.shape[-1]
    fp = ((f + 127) // 128) * 128
    if fp == f:
        return a, f
    return jnp.pad(a, ((0, 0), (0, fp - f))), f


def _blocked_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    eid = jnp.minimum(blk.edge_id, w.shape[0] - 1)
    msgs = gather(x, blk.src).astype(jnp.float32) * w[eid].astype(jnp.float32)[:, None]
    msgs, f = _pad_features(msgs.astype(msg_dtype))
    out = blocked_segment_sum(msgs, blk, num_nodes, interpret=interpret)
    return out[:, :f].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _spmm_blocked(x, w, blk, tblk, csc_perm, senders, receivers,
                  num_nodes: int, msg_dtype, interpret: bool):
    return _blocked_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)


def _spmm_blocked_fwd(x, w, blk, tblk, csc_perm, senders, receivers,
                      num_nodes, msg_dtype, interpret):
    out = _blocked_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)
    return out, (x, w, blk, tblk, csc_perm, senders, receivers)


def _tree_float0(tree):
    return jax.tree_util.tree_map(float0_like, tree)


def _blocked_dx(g, w, tblk, csc_perm, num_nodes, msg_dtype, interpret, dtype):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    w_csc = w[csc_perm].astype(jnp.float32)
    eid = jnp.minimum(tblk.edge_id, w_csc.shape[0] - 1)
    msgs = gather(g, tblk.src).astype(jnp.float32) * w_csc[eid][:, None]
    msgs, f = _pad_features(msgs.astype(msg_dtype))
    dx = blocked_segment_sum(msgs, tblk, num_nodes, interpret=interpret)
    return dx[:, :f].astype(dtype)


def _spmm_blocked_bwd(num_nodes, msg_dtype, interpret, res, g):
    x, w, blk, tblk, csc_perm, senders, receivers = res
    dx = _blocked_dx(g, w, tblk, csc_perm, num_nodes, msg_dtype, interpret, x.dtype)
    gf = g.astype(jnp.float32)
    valid = receivers < num_nodes
    dw = jnp.sum(gather(gf, receivers) * gather(x, senders).astype(jnp.float32), axis=-1)
    dw = jnp.where(valid, dw, 0.0).astype(w.dtype)
    return (
        dx, dw, _tree_float0(blk), _tree_float0(tblk),
        float0_like(csc_perm), float0_like(senders), float0_like(receivers),
    )


_spmm_blocked.defvjp(_spmm_blocked_fwd, _spmm_blocked_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _spmm_blocked_nowg(x, w, blk, tblk, csc_perm,
                       num_nodes: int, msg_dtype, interpret: bool):
    """Variant with non-differentiable edge weights (GCN's cached
    normalization) — skips the SDDMM weight-gradient entirely."""
    return _blocked_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)


def _spmm_blocked_nowg_fwd(x, w, blk, tblk, csc_perm, num_nodes, msg_dtype, interpret):
    out = _blocked_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)
    # zero-size carrier for x's dtype (residuals must be JAX types)
    return out, (jnp.zeros((0,), x.dtype), w, blk, tblk, csc_perm)


def _spmm_blocked_nowg_bwd(num_nodes, msg_dtype, interpret, res, g):
    dtype_carrier, w, blk, tblk, csc_perm = res
    dtype = dtype_carrier.dtype
    dx = _blocked_dx(g, w, tblk, csc_perm, num_nodes, msg_dtype, interpret, dtype)
    return (dx, float0_like(w), _tree_float0(blk), _tree_float0(tblk),
            float0_like(csc_perm))


_spmm_blocked_nowg.defvjp(_spmm_blocked_nowg_fwd, _spmm_blocked_nowg_bwd)


def spmm(
    graph: Graph,
    x: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray] = None,
    transpose: bool = False,
) -> jnp.ndarray:
    """``out[r] = sum_{e:(s->r)} w_e * x[s]`` — message passing aggregation.

    Args:
      graph: the adjacency (receiver-sorted padded COO, see container docs).
      x: float[num_nodes, F] node features.
      edge_weight: optional per-edge scalars in *receiver-sorted* order;
        overrides ``graph.edge_weight``. Differentiable (used for GAT
        attention coefficients).
      transpose: aggregate over the reversed edges instead.
    """
    if transpose:
        graph = graph.transpose()
    weight_grad = edge_weight is not None
    w = edge_weight if edge_weight is not None else graph.edge_weight
    if w is None:
        w = graph.edge_mask.astype(x.dtype)

    from efficient_gnns_tpu.ops import dispatch

    if graph.blocking is not None and dispatch.pallas_enabled():
        args = (x, w, graph.blocking, graph.t_blocking, graph.csc_perm)
        if weight_grad:
            return _spmm_blocked(
                *args, graph.senders, graph.receivers,
                graph.num_nodes, dispatch.message_dtype(), dispatch.interpret_mode(),
            )
        return _spmm_blocked_nowg(
            *args, graph.num_nodes, dispatch.message_dtype(),
            dispatch.interpret_mode(),
        )

    return _spmm(
        x,
        w,
        graph.senders,
        graph.receivers,
        graph.t_senders,
        graph.t_receivers,
        graph.csc_perm,
        graph.row_offsets,
        graph.num_nodes,
    )


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def _spmm_heads(x, w, senders, receivers, t_senders, t_receivers, csc_perm, num_nodes: int):
    # x: [N, H, D], w: [E, H] -> out [N, H, D]
    msgs = gather(x, senders).astype(jnp.float32) * w[:, :, None].astype(jnp.float32)
    out = segment_sum(msgs, receivers, num_nodes, indices_are_sorted=True)
    return out.astype(x.dtype)


def _spmm_heads_fwd(x, w, senders, receivers, t_senders, t_receivers, csc_perm, num_nodes):
    out = _spmm_heads(x, w, senders, receivers, t_senders, t_receivers, csc_perm, num_nodes)
    return out, (x, w, senders, receivers, t_senders, t_receivers, csc_perm)


def _spmm_heads_bwd(num_nodes, res, g):
    x, w, senders, receivers, t_senders, t_receivers, csc_perm = res
    gf = g.astype(jnp.float32)
    msgs = gather(gf, receivers) * w[:, :, None].astype(jnp.float32)
    dx = segment_sum(
        msgs[csc_perm], t_receivers, num_nodes, indices_are_sorted=True
    ).astype(x.dtype)
    valid = (receivers < num_nodes)[:, None]
    dw = jnp.sum(gather(gf, receivers) * gather(x, senders).astype(jnp.float32), axis=-1)
    dw = jnp.where(valid, dw, 0.0).astype(w.dtype)
    return (
        dx,
        dw,
        float0_like(senders),
        float0_like(receivers),
        float0_like(t_senders),
        float0_like(t_receivers),
        float0_like(csc_perm),
    )


_spmm_heads.defvjp(_spmm_heads_fwd, _spmm_heads_bwd)


def _blocked_heads_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    n, h, d = x.shape
    eid = jnp.minimum(blk.edge_id, w.shape[0] - 1)
    msgs = gather(x, blk.src).astype(jnp.float32) * w[eid].astype(jnp.float32)[:, :, None]
    msgs, f = _pad_features(msgs.reshape(-1, h * d).astype(msg_dtype))
    out = blocked_segment_sum(msgs, blk, num_nodes, interpret=interpret)
    return out[:, : h * d].reshape(num_nodes, h, d).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _spmm_heads_blocked(x, w, blk, tblk, csc_perm, senders, receivers,
                        num_nodes: int, msg_dtype, interpret: bool):
    return _blocked_heads_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)


def _spmm_heads_blocked_fwd(x, w, blk, tblk, csc_perm, senders, receivers,
                            num_nodes, msg_dtype, interpret):
    out = _blocked_heads_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)
    return out, (x, w, blk, tblk, csc_perm, senders, receivers)


def _spmm_heads_blocked_bwd(num_nodes, msg_dtype, interpret, res, g):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    x, w, blk, tblk, csc_perm, senders, receivers = res
    n, h, d = x.shape
    gf = g.astype(jnp.float32)
    w_csc = w[csc_perm].astype(jnp.float32)
    eid = jnp.minimum(tblk.edge_id, w_csc.shape[0] - 1)
    msgs = gather(gf, tblk.src) * w_csc[eid][:, :, None]
    msgs, _ = _pad_features(msgs.reshape(-1, h * d).astype(msg_dtype))
    dx = blocked_segment_sum(msgs, tblk, num_nodes, interpret=interpret)
    dx = dx[:, : h * d].reshape(num_nodes, h, d).astype(x.dtype)

    valid = (receivers < num_nodes)[:, None]
    dw = jnp.sum(gather(gf, receivers) * gather(x, senders).astype(jnp.float32), axis=-1)
    dw = jnp.where(valid, dw, 0.0).astype(w.dtype)
    return (
        dx, dw, _tree_float0(blk), _tree_float0(tblk),
        float0_like(csc_perm), float0_like(senders), float0_like(receivers),
    )


_spmm_heads_blocked.defvjp(_spmm_heads_blocked_fwd, _spmm_heads_blocked_bwd)


def spmm_heads(graph: Graph, x: jnp.ndarray, edge_weight: jnp.ndarray) -> jnp.ndarray:
    """Multi-head weighted SpMM: ``out[r,h] = sum_e w[e,h] * x[s_e,h]``.

    One fused gather/scatter for all GAT heads (x: [N,H,D], w: [E,H]) —
    avoids per-head SpMM calls in multi-head attention layers.
    """
    from efficient_gnns_tpu.ops import dispatch

    if graph.blocking is not None and dispatch.pallas_enabled():
        return _spmm_heads_blocked(
            x, edge_weight, graph.blocking, graph.t_blocking, graph.csc_perm,
            graph.senders, graph.receivers,
            graph.num_nodes, dispatch.message_dtype(), dispatch.interpret_mode(),
        )
    return _spmm_heads(
        x,
        edge_weight,
        graph.senders,
        graph.receivers,
        graph.t_senders,
        graph.t_receivers,
        graph.csc_perm,
        graph.num_nodes,
    )


def spmm_mean(
    graph: Graph,
    x: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean-aggregated SpMM (torch-sparse ``matmul(..., reduce='mean')``,
    reference ``mag_pyg/gnn.py:149-163``; SAGE neighbor mean)."""
    total = spmm(graph, x, edge_weight)
    deg = graph.in_degrees().astype(total.dtype)
    return total / jnp.maximum(deg, 1.0)[:, None]
