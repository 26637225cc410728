"""SDDMM — sampled dense-dense products producing per-edge values.

Replaces DGL's ``apply_edges(fn.u_add_v ...)`` (GAT attention logits,
reference ``arxiv_dgl/models.py:196-205``) and the per-edge feature-similarity
gathers of the LSP loss (``arxiv_pyg/criterion.py:100-113``).

Custom VJPs route the sender-side gradients through the sender-sorted edge
order (``csc_perm``) so both scatter directions stay sorted (see spmm.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops.segment import float0_like, gather, segment_sum


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _sddmm_add(el, er, senders, receivers, t_receivers, csc_perm, num_nodes: int):
    # out_e = el[sender_e] + er[receiver_e]; padded edges produce a value too
    # (clipped gather) — callers mask via edge_softmax / edge_mask.
    return gather(el, senders) + gather(er, receivers)


def _sddmm_add_fwd(el, er, senders, receivers, t_receivers, csc_perm, num_nodes):
    out = _sddmm_add(el, er, senders, receivers, t_receivers, csc_perm, num_nodes)
    return out, (senders, receivers, t_receivers, csc_perm)


def _sddmm_add_bwd(num_nodes, res, g):
    senders, receivers, t_receivers, csc_perm = res
    # receiver-side: scatter by receivers (already sorted);
    # sender-side: permute cotangents into sender-sorted order first.
    der = segment_sum(g, receivers, num_nodes, indices_are_sorted=True)
    del_ = segment_sum(g[csc_perm], t_receivers, num_nodes, indices_are_sorted=True)
    return (
        del_,
        der,
        float0_like(senders),
        float0_like(receivers),
        float0_like(t_receivers),
        float0_like(csc_perm),
    )


_sddmm_add.defvjp(_sddmm_add_fwd, _sddmm_add_bwd)


def sddmm_add(graph: Graph, el: jnp.ndarray, er: jnp.ndarray) -> jnp.ndarray:
    """``out_e = el[sender_e] + er[receiver_e]`` (any trailing dims, e.g. heads)."""
    return _sddmm_add(
        el, er, graph.senders, graph.receivers, graph.t_receivers, graph.csc_perm,
        graph.num_nodes,
    )


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _sddmm_dot(a, b, senders, receivers, t_receivers, csc_perm, num_nodes: int):
    av = gather(a, receivers).astype(jnp.float32)
    bv = gather(b, senders).astype(jnp.float32)
    out = jnp.sum(av * bv, axis=-1)
    return jnp.where(receivers < num_nodes, out, 0.0).astype(a.dtype)


def _sddmm_dot_fwd(a, b, senders, receivers, t_receivers, csc_perm, num_nodes):
    out = _sddmm_dot(a, b, senders, receivers, t_receivers, csc_perm, num_nodes)
    return out, (a, b, senders, receivers, t_receivers, csc_perm)


def _sddmm_dot_bwd(num_nodes, res, g):
    a, b, senders, receivers, t_receivers, csc_perm = res
    gf = jnp.where(receivers < num_nodes, g, 0.0).astype(jnp.float32)[:, None]
    da = segment_sum(
        gf * gather(b, senders).astype(jnp.float32),
        receivers, num_nodes, indices_are_sorted=True,
    ).astype(a.dtype)
    msgs = gf * gather(a, receivers).astype(jnp.float32)
    db = segment_sum(
        msgs[csc_perm], t_receivers, num_nodes, indices_are_sorted=True
    ).astype(b.dtype)
    return (
        da,
        db,
        float0_like(senders),
        float0_like(receivers),
        float0_like(t_receivers),
        float0_like(csc_perm),
    )


_sddmm_dot.defvjp(_sddmm_dot_fwd, _sddmm_dot_bwd)


def sddmm_dot(graph: Graph, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``out_e = <a[receiver_e], b[sender_e]>`` — per-edge dot product.

    The edge-restricted similarity primitive (LSP kernels; also the
    edge-weight gradient of SpMM). Padded edges yield 0.
    """
    return _sddmm_dot(
        a, b, graph.senders, graph.receivers, graph.t_receivers, graph.csc_perm,
        graph.num_nodes,
    )
