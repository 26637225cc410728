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
    x = jax.lax.optimization_barrier(x)  # keep the gather un-fused (see _after)
    msgs = gather(x, senders).astype(jnp.float32) * w[:, None].astype(jnp.float32)
    out = segment_sum(msgs, receivers, num_nodes, indices_are_sorted=True)
    return out.astype(out_dtype)


def _spmm_fwd(x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets, num_nodes):
    out = _spmm(x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets, num_nodes)
    return out, (x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets)


def _spmm_bwd(num_nodes, res, g):
    x, w, senders, receivers, t_senders, t_receivers, csc_perm, row_offsets = res
    g, x = jax.lax.optimization_barrier((g, x))  # see _after
    gf = g.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    # dX = A^T @ (G * w): per-edge message g[receiver]*w, re-sorted into the
    # sender-sorted (transpose) order so the scatter is again sorted.
    gr = gather(gf, receivers)
    msgs = gr * wf[:, None]
    msgs, x = _after(msgs, x)  # sequence gathers (HBM thrash; see _after)
    dx = segment_sum(
        msgs[csc_perm], t_receivers, num_nodes, indices_are_sorted=True
    ).astype(x.dtype)

    # dW = SDDMM row-dot <g[receiver], x[sender]> (GAT attention gradients).
    valid = receivers < num_nodes
    dx, x = _after(dx, x)
    dw = jnp.sum(gr * gather(x, senders).astype(jnp.float32), axis=-1)
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
#
# Three variants, fastest first:
#   * unweighted    — no per-edge scale at all (SAGE sum, SIGN precompute);
#   * static weights — the graph's edge_weight pre-permuted into blocked
#     layout at build time (EdgeBlocking.w_blk; GCN normalization, mean
#     aggregation). Zero runtime edge permutations.
#   * runtime weights — differentiable per-step weights (GAT attention).
#     The CSR->blocked permutation is done as a width-8 replicated row
#     gather: a plain scalar gather is latency-bound at ~10 ns/element
#     (~20 ms for 2M edges); replicating to [E, 8] first cuts it to ~11 ms.
# ---------------------------------------------------------------------------


def _pad_features(a: jnp.ndarray):
    f = a.shape[-1]
    fp = ((f + 127) // 128) * 128
    if fp == f:
        return a, f
    return jnp.pad(a, ((0, 0), (0, fp - f))), f


def _tree_float0(tree):
    return jax.tree_util.tree_map(float0_like, tree)


def _after(dep, *vals):
    """Schedule the computation of ``vals`` after ``dep`` is materialized.

    TPU HBM random-access streams thrash each other: two independent row
    gathers that XLA schedules concurrently run ~3x slower than in sequence
    (measured 56 ms vs 19 ms for ogbn-arxiv's [2.1M, 128] gather + [2.1M, 8]
    gather on v5e). Every multi-gather op here chains its gathers.
    """
    out = jax.lax.optimization_barrier((dep,) + vals)
    return out if len(vals) else out[0]


def _expand_runtime(w: jnp.ndarray, blocking) -> jnp.ndarray:
    """Permute CSR-ordered per-edge scalars into the blocked layout
    (width-8 replicated row gather; see module comment). Uses the
    blocking's precomputed CSR mapping so the transpose blocking needs no
    extra csc permutation."""
    mapping = blocking.csr_perm if blocking.csr_perm is not None else blocking.edge_id
    eid = jnp.minimum(mapping, w.shape[0] - 1)
    rep = jnp.broadcast_to(w[:, None], (w.shape[0], 8))
    nb, eb = blocking.num_blocks, blocking.eb
    return gather(rep, eid)[:, 0].reshape(nb, eb)


def _blocked_scatter(values, node_idx_blk, blocking, num_nodes, w_blk,
                     msg_dtype, interpret, out_dtype):
    """gather rows -> (scale) -> one-hot MXU scatter, features padded to 128."""
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    msgs = gather(values.astype(msg_dtype), node_idx_blk)
    msgs, f = _pad_features(msgs)
    out = blocked_segment_sum(
        msgs, blocking, num_nodes, w=w_blk, interpret=interpret
    )
    return out[:, :f].astype(out_dtype)


# ---- unweighted ------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spmm_blocked_unweighted(x, blk, tblk, num_nodes: int, msg_dtype, interpret):
    x = jax.lax.optimization_barrier(x)  # keep gathers un-fused (see _after)
    return _blocked_scatter(x, blk.src, blk, num_nodes, None,
                            msg_dtype, interpret, x.dtype)


def _spmm_blocked_unw_fwd(x, blk, tblk, num_nodes, msg_dtype, interpret):
    out = _spmm_blocked_unweighted(x, blk, tblk, num_nodes, msg_dtype, interpret)
    return out, (jnp.zeros((0,), x.dtype), blk, tblk)


def _spmm_blocked_unw_bwd(num_nodes, msg_dtype, interpret, res, g):
    dtype_carrier, blk, tblk = res
    g = jax.lax.optimization_barrier(g)  # keep gathers un-fused (see _after)
    dx = _blocked_scatter(g, tblk.src, tblk, num_nodes, None,
                          msg_dtype, interpret, dtype_carrier.dtype)
    return (dx, _tree_float0(blk), _tree_float0(tblk))


_spmm_blocked_unweighted.defvjp(_spmm_blocked_unw_fwd, _spmm_blocked_unw_bwd)


# ---- static weights (pre-blocked w_blk) ------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _spmm_blocked_static(x, blk, tblk, num_nodes: int, msg_dtype, interpret):
    x = jax.lax.optimization_barrier(x)  # keep gathers un-fused (see _after)
    return _blocked_scatter(x, blk.src, blk, num_nodes, blk.w_blk,
                            msg_dtype, interpret, x.dtype)


def _spmm_blocked_static_fwd(x, blk, tblk, num_nodes, msg_dtype, interpret):
    out = _spmm_blocked_static(x, blk, tblk, num_nodes, msg_dtype, interpret)
    return out, (jnp.zeros((0,), x.dtype), blk, tblk)


def _spmm_blocked_static_bwd(num_nodes, msg_dtype, interpret, res, g):
    dtype_carrier, blk, tblk = res
    g = jax.lax.optimization_barrier(g)  # keep gathers un-fused (see _after)
    dx = _blocked_scatter(g, tblk.src, tblk, num_nodes, tblk.w_blk,
                          msg_dtype, interpret, dtype_carrier.dtype)
    return (dx, _tree_float0(blk), _tree_float0(tblk))


_spmm_blocked_static.defvjp(_spmm_blocked_static_fwd, _spmm_blocked_static_bwd)


# ---- runtime (differentiable) weights ---------------------------------------


def _blocked_runtime_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    x, w = jax.lax.optimization_barrier((x, w))  # see _after
    msgs = gather(x.astype(msg_dtype), blk.src)
    msgs, w = _after(msgs, w)  # sequence the two gathers (see _after)
    w_blk = _expand_runtime(w, blk)
    msgs, f = _pad_features(msgs)
    out = blocked_segment_sum(msgs, blk, num_nodes, w=w_blk, interpret=interpret)
    return out[:, :f].astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _spmm_blocked(x, w, blk, tblk, csc_perm, senders, receivers,
                  num_nodes: int, msg_dtype, interpret: bool,
                  weight_grad: bool = True):
    return _blocked_runtime_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)


def _spmm_blocked_fwd(x, w, blk, tblk, csc_perm, senders, receivers,
                      num_nodes, msg_dtype, interpret, weight_grad):
    out = _blocked_runtime_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret)
    return out, (x, w, blk, tblk, csc_perm, senders, receivers)


def _spmm_blocked_bwd(num_nodes, msg_dtype, interpret, weight_grad, res, g):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    x, w, blk, tblk, csc_perm, senders, receivers = res
    # materialize the cotangent and chain the backward gathers (see _after)
    g, x, w = jax.lax.optimization_barrier((g, x, w))
    g_blk = gather(g.astype(msg_dtype), tblk.src)
    g_blk, w = _after(g_blk, w)
    if tblk.csr_perm is not None:
        w_t_blk = _expand_runtime(w, tblk)
    else:
        w_t_blk = _expand_runtime(w[csc_perm], tblk)
    g_blk_p, f = _pad_features(g_blk)
    dx = blocked_segment_sum(
        g_blk_p, tblk, num_nodes, w=w_t_blk, interpret=interpret
    )[:, :f].astype(x.dtype)
    valid = receivers < num_nodes
    if weight_grad and blk.inv_perm is not None:
        # dW via per-edge row-dots against resident cotangent tiles (no
        # random gather of g); result returns to CSR order via inv_perm.
        from efficient_gnns_tpu.ops.pallas import blocked_sddmm_dw

        dx, x = _after(dx, x)
        gp, _ = _pad_features(g.astype(msg_dtype))
        x_blk = gather(_pad_features(x.astype(msg_dtype))[0], blk.src)
        gt = _pad_rows(gp, blk.num_tiles * blk.tm)
        dw_blk = blocked_sddmm_dw(gt, x_blk, blk, interpret=interpret)
        dw = jnp.where(valid, gather(dw_blk, blk.inv_perm), 0.0).astype(w.dtype)
    elif weight_grad:
        gf = g.astype(jnp.float32)
        w_t_blk, gf, x = _after(w_t_blk, gf, x)
        gr = gather(gf, receivers)
        gr, x = _after(gr, x)
        xr = gather(x, senders).astype(jnp.float32)
        dw = jnp.where(valid, jnp.sum(gr * xr, axis=-1), 0.0).astype(w.dtype)
    else:
        dw = jnp.zeros_like(w)
    return (
        dx, dw, _tree_float0(blk), _tree_float0(tblk),
        float0_like(csc_perm), float0_like(senders), float0_like(receivers),
    )


_spmm_blocked.defvjp(_spmm_blocked_fwd, _spmm_blocked_bwd)


def spmm(
    graph: Graph,
    x: jnp.ndarray,
    edge_weight: Optional[jnp.ndarray] = None,
    transpose: bool = False,
    weight_grad: bool = True,
) -> jnp.ndarray:
    """``out[r] = sum_{e:(s->r)} w_e * x[s]`` — message passing aggregation.

    Args:
      graph: the adjacency (receiver-sorted padded COO, see container docs).
      x: float[num_nodes, F] node features.
      edge_weight: optional per-edge scalars in *receiver-sorted* order;
        overrides ``graph.edge_weight``. Differentiable (used for GAT
        attention coefficients).
      transpose: aggregate over the reversed edges instead.
      weight_grad: set False when ``edge_weight`` carries no gradient (e.g.
        relation masks) to skip the SDDMM weight-gradient in the backward.
    """
    if transpose:
        graph = graph.transpose()

    if graph.node_scale is not None and edge_weight is not None:
        # runtime weights on a factored-norm graph: S·A_w·S is NOT the GCN
        # normalization of the weighted adjacency — silently skipping the
        # scales (old behavior) is wrong either way, so refuse loudly
        raise ValueError(
            "spmm: runtime edge_weight on a gcn_norm='factored' graph is "
            "undefined — build the graph with gcn_norm=False (or 'fused') "
            "when per-call edge weights are used"
        )
    if graph.node_scale is not None and edge_weight is None:
        # factored symmetric normalization: out = S @ (A @ (S @ x)) with the
        # unweighted structures (build_graph(gcn_norm="factored")) — the
        # diagonal scalings fuse into neighboring elementwise ops under XLA
        scale = graph.node_scale[:, None]
        inner = graph.replace(node_scale=None)
        out = spmm(inner, (x * scale).astype(x.dtype), weight_grad=False)
        return (out * scale).astype(x.dtype)

    from efficient_gnns_tpu.ops import dispatch

    if graph.blocking is not None and dispatch.pallas_enabled():
        from efficient_gnns_tpu.graphs.hub_dense import hub_contribution

        blk, tblk = graph.blocking, graph.t_blocking
        md, im = dispatch.message_dtype(), dispatch.interpret_mode()
        hub = graph.hub
        if edge_weight is not None:  # runtime (differentiable) weights
            if hub is None:
                return _spmm_blocked(
                    x, edge_weight, blk, tblk, graph.csc_perm,
                    graph.senders, graph.receivers,
                    graph.num_nodes, md, im, weight_grad,
                )
            # hub graphs block only residual edges and cache static weights
            # densely — per-step weights can't ride that layout; take the
            # full-edge XLA path (build such graphs with hub_dense=0).
        elif graph.edge_weight is not None:
            if blk.w_blk is not None:  # static weights pre-blocked at build
                out = _spmm_blocked_static(x, blk, tblk, graph.num_nodes, md, im)
                if hub is not None:
                    out = (out.astype(jnp.float32) + hub_contribution(hub, x)
                           ).astype(x.dtype)
                return out
            if hub is None:
                # blocking attached before weights: treat as runtime, no grad
                return _spmm_blocked(
                    x, graph.edge_weight, blk, tblk, graph.csc_perm,
                    graph.senders, graph.receivers,
                    graph.num_nodes, md, im, False,
                )
            # hub slices not refreshed for these weights (see
            # attach_blocked_weights) — fall through to the XLA path.
        else:
            out = _spmm_blocked_unweighted(x, blk, tblk, graph.num_nodes, md, im)
            if hub is not None:
                out = (out.astype(jnp.float32) + hub_contribution(hub, x)
                       ).astype(x.dtype)
            return out

    w = edge_weight if edge_weight is not None else graph.edge_weight
    if w is None:
        w = graph.edge_mask.astype(x.dtype)
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
    x = jax.lax.optimization_barrier(x)  # keep the gather un-fused (see _after)
    msgs = gather(x, senders).astype(jnp.float32) * w[:, :, None].astype(jnp.float32)
    out = segment_sum(msgs, receivers, num_nodes, indices_are_sorted=True)
    return out.astype(x.dtype)


def _spmm_heads_fwd(x, w, senders, receivers, t_senders, t_receivers, csc_perm, num_nodes):
    out = _spmm_heads(x, w, senders, receivers, t_senders, t_receivers, csc_perm, num_nodes)
    return out, (x, w, senders, receivers, t_senders, t_receivers, csc_perm)


def _spmm_heads_bwd(num_nodes, res, g):
    x, w, senders, receivers, t_senders, t_receivers, csc_perm = res
    g, x = jax.lax.optimization_barrier((g, x))  # see _after
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


def _heads_w_blocked(w, blocking):
    """[E, H] runtime head-weights into blocked order (one row gather)."""
    mapping = blocking.csr_perm if blocking.csr_perm is not None else blocking.edge_id
    return gather(w, jnp.minimum(mapping, w.shape[0] - 1))


_HEADS_FUSED_VMEM = 8 * 1024 * 1024  # bytes; conservative vs 16 MB VMEM


def _heads_fused_ok(blk, h, dp, itemsize) -> bool:
    """The fused per-head-scale kernel tiles the grid per head, so only one
    head's EB x Dp msgs block + TM x Dp f32 out tile (double-buffered) must
    fit VMEM — float32-safe at GAT-teacher width (3 heads x 256)."""
    if blk.inv_perm is None:  # blocking predates the fused layout
        return False
    return 2 * (blk.eb * dp * itemsize + blk.tm * dp * 4) <= _HEADS_FUSED_VMEM


def _pad_heads(x):
    """[N, H, D] -> ([N, H*Dp], Dp) with each head's features 128-aligned,
    so per-head column slices stay lane-aligned inside Pallas kernels."""
    n, h, d = x.shape
    dp = ((d + 127) // 128) * 128
    if dp != d:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))
    return x.reshape(n, h * dp), dp


def _heads_w3(w, blocking):
    """[E, H] CSR-ordered head weights -> [nb, H, EB] for the fused kernel.
    Padding slots keep whatever the clipped gather reads: their one-hot row
    is zero, so the kernel drops them regardless."""
    nb, eb = blocking.num_blocks, blocking.eb
    h = w.shape[-1]
    return jnp.moveaxis(_heads_w_blocked(w, blocking).reshape(nb, eb, h), 2, 1)


def _pad_rows(a, rows):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _blocked_heads_fwd_impl(x, w, blk, num_nodes, msg_dtype, interpret):
    from efficient_gnns_tpu.ops.pallas import (
        blocked_segment_sum,
        blocked_segment_sum_heads,
    )

    n, h, d = x.shape
    x, w = jax.lax.optimization_barrier((x, w))  # see _after
    dp_probe = ((d + 127) // 128) * 128
    if _heads_fused_ok(blk, h, dp_probe, jnp.dtype(msg_dtype).itemsize):
        # fused path: gather unscaled messages (head-major, 128-aligned) and
        # apply the per-(edge, head) scale inside the scatter kernel — the
        # scaled [E, H*D] array never round-trips HBM.
        xf, dp = _pad_heads(x.astype(msg_dtype))
        x_blk = gather(xf, blk.src)
        x_blk, w = _after(x_blk, w)
        w3 = _heads_w3(w.astype(jnp.float32), blk)
        out = blocked_segment_sum_heads(
            x_blk, w3, blk, num_nodes, h, interpret=interpret
        )
        return out.reshape(num_nodes, h, dp)[:, :, :d].astype(x.dtype)
    # wide fallback: pre-scale then feature-tiled scatter
    x_blk = gather(x.astype(msg_dtype), blk.src)
    x_blk, w = _after(x_blk, w)  # sequence gathers (see _after)
    w_blk = _heads_w_blocked(w, blk)
    msgs = x_blk.reshape(-1, h, d) * w_blk.astype(msg_dtype)[:, :, None]
    msgs, f = _pad_features(msgs.reshape(-1, h * d))
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
    from efficient_gnns_tpu.ops.pallas import (
        blocked_sddmm_dw_heads,
        blocked_segment_sum,
        blocked_segment_sum_heads,
    )

    x, w, blk, tblk, csc_perm, senders, receivers = res
    n, h, d = x.shape
    g, x = jax.lax.optimization_barrier((g, x))  # see _after
    dp_probe = ((d + 127) // 128) * 128
    fused = _heads_fused_ok(blk, h, dp_probe, jnp.dtype(msg_dtype).itemsize) \
        and _heads_fused_ok(tblk, h, dp_probe, jnp.dtype(msg_dtype).itemsize)

    if fused:
        # dX: fused per-head-scaled scatter over the transpose blocking
        gp, dp = _pad_heads(g.astype(msg_dtype))
        g_blk = gather(gp, tblk.src)
        g_blk, w = _after(g_blk, w)
        w_src = w if tblk.csr_perm is not None else w[csc_perm]
        w3_t = _heads_w3(w_src.astype(jnp.float32), tblk)
        dx = blocked_segment_sum_heads(
            g_blk, w3_t, tblk, num_nodes, h, interpret=interpret
        ).reshape(num_nodes, h, dp)[:, :, :d].astype(x.dtype)

        # dW: per-(edge, head) row-dots against resident cotangent tiles —
        # no random gather of g; x rows re-gathered in the forward layout.
        dx, x = _after(dx, x)
        xf, _ = _pad_heads(x.astype(msg_dtype))
        x_blk = gather(xf, blk.src)
        gt = _pad_rows(gp, blk.num_tiles * blk.tm)
        dw_blk = blocked_sddmm_dw_heads(gt, x_blk, blk, h, interpret=interpret)
        dw = gather(dw_blk, blk.inv_perm)  # thin, CSR order
        valid = (receivers < num_nodes)[:, None]
        dw = jnp.where(valid, dw, 0.0).astype(w.dtype)
        return (
            dx, dw, _tree_float0(blk), _tree_float0(tblk),
            float0_like(csc_perm), float0_like(senders), float0_like(receivers),
        )

    gf = g.astype(jnp.float32)
    g_blk = gather(g.astype(msg_dtype), tblk.src)
    g_blk, w = _after(g_blk, w)  # sequence gathers (see _after)
    if tblk.csr_perm is not None:
        w_t = _heads_w_blocked(w, tblk).astype(msg_dtype)
    else:
        w_t = _heads_w_blocked(w[csc_perm], tblk).astype(msg_dtype)
    msgs = g_blk * w_t[:, :, None]
    msgs, _ = _pad_features(msgs.reshape(-1, h * d))
    dx = blocked_segment_sum(msgs, tblk, num_nodes, interpret=interpret)
    dx = dx[:, : h * d].reshape(num_nodes, h, d).astype(x.dtype)

    valid = (receivers < num_nodes)[:, None]
    w_t, gf, x = _after(w_t, gf, x)
    gr = gather(gf, receivers)
    gr, x = _after(gr, x)
    dw = jnp.sum(gr * gather(x, senders).astype(jnp.float32), axis=-1)
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

    # hub graphs block only residual edges — per-step head weights need the
    # full edge set, so they take the XLA path (build GAT graphs hub_dense=0)
    if graph.blocking is not None and graph.hub is None and dispatch.pallas_enabled():
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
    if graph.node_scale is not None:
        # S·A·S·x / deg is neither a neighbor mean nor the GCN norm
        raise ValueError(
            "spmm_mean on a gcn_norm='factored' graph is undefined — build "
            "mean-aggregating graphs (SAGE, hop precompute) with "
            "gcn_norm=False"
        )
    total = spmm(graph, x, edge_weight)
    deg = graph.in_degrees().astype(total.dtype)
    return total / jnp.maximum(deg, 1.0)[:, None]
