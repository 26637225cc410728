"""Fused blocked GAT attention: SDDMM -> edge-softmax -> weighted SpMM.

TPU-native replacement for the reference's GAT hot loop
(``arxiv_dgl/models.py:196-218``: ``apply_edges(u_add_v)`` ->
``edge_softmax`` -> ``update_all(u_mul_e, sum)``) that never materializes a
per-edge array in CSR order. The whole attention pipeline runs in the
*blocked* edge layout of graphs/blocking.py:

* attention logits: one thin row-gather of ``el`` by blocked senders plus a
  ``tile_rows_thin`` one-hot MXU read of ``er`` destination rows;
* edge softmax: blocked thin segment max / sum Pallas kernels with the
  normalizers broadcast back through resident output tiles
  (ops/pallas/segment_thin.py) — no XLA scatter loop, no [E, H] gathers;
* aggregation: per-head-scaled one-hot MXU scatter
  (``blocked_segment_sum_heads``) consuming the probabilities directly in
  blocked order — the CSR->blocked weight permutation of the generic
  ``spmm_heads`` path disappears;
* backward: ``blocked_sddmm_dw_heads`` produces the probability cotangent
  in blocked order; ONE packed thin gather over the precomputed
  ``cross_perm`` (EdgeBlocking) moves (probabilities, logit grads) into the
  transpose layout for the dX scatter and the sender-side logit gradient.

Edge-drop (``keep_mask``) removes edges *before* normalization — the
reference's subset edge-softmax semantics (``arxiv_dgl/models.py:207-214``).
Attention dropout (``attn_keep`` / ``attn_keep_prob``) matches
``nn.Dropout`` scaling. Both masks are sampled in blocked order by the
caller (same marginal distribution as CSR-order sampling).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops.segment import float0_like, gather

_F32_MIN = float(jnp.finfo(jnp.float32).min)
_F32_TINY = float(jnp.finfo(jnp.float32).tiny)


def _pad_heads(x, msg_dtype):
    """[N, H, D] -> ([N, H*Dp], Dp) with 128-aligned per-head slices."""
    n, h, d = x.shape
    dp = ((d + 127) // 128) * 128
    x = x.astype(msg_dtype)
    if dp != d:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))
    return x.reshape(n, h * dp), dp


def _pad_rows(a, rows):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _gather_thin(v, idx):
    """Row gather of a thin [N, H] array via an 8-lane padded layout (a
    plain H-lane gather is latency-bound on TPU; see ops/spmm.py notes)."""
    h = v.shape[-1]
    hp = 8 if h <= 8 else ((h + 127) // 128) * 128
    if hp != h:
        v = jnp.pad(v, ((0, 0), (0, hp - h)))
    return gather(v, idx)[:, :h]


def _after(dep, *vals):
    """Sequence gathers: see ops/spmm.py::_after (HBM stream thrash)."""
    out = jax.lax.optimization_barrier((dep,) + vals)
    return out if len(vals) else out[0]


def _tree_float0(tree):
    return jax.tree_util.tree_map(float0_like, tree)


def _softmax_blocked(e, blk, slot_mask, interpret):
    """Segment softmax over blocked-order logits ``e`` [nb*EB, H].

    Returns probabilities (0 at masked/padding slots). Masked slots are
    excluded from the normalization entirely (edge-drop semantics)."""
    from efficient_gnns_tpu.ops.pallas import (
        blocked_segment_max_thin,
        blocked_segment_sum_thin,
        tile_rows_thin,
    )

    ntm = blk.num_tiles * blk.tm
    em = jnp.where(slot_mask[:, None], e, _F32_MIN)
    m = blocked_segment_max_thin(em, blk, ntm, interpret=interpret)
    z = jnp.exp(e - tile_rows_thin(m, blk, interpret=interpret))
    z = jnp.where(slot_mask[:, None], z, 0.0)
    s = blocked_segment_sum_thin(z, blk, ntm, interpret=interpret)
    r = 1.0 / jnp.maximum(s, _F32_TINY)
    return z * tile_rows_thin(r, blk, interpret=interpret)


def _attention_fwd_impl(feat, el, er, keep_mask, attn_keep, blk, tblk,
                        num_nodes, negative_slope, attn_keep_prob,
                        msg_dtype, interpret):
    from efficient_gnns_tpu.ops.pallas import (
        blocked_segment_sum_heads,
        tile_rows_thin,
    )

    n, h, d = feat.shape
    nb, eb, tm = blk.num_blocks, blk.eb, blk.tm
    ntm = blk.num_tiles * tm

    feat, el = jax.lax.optimization_barrier((feat, el))
    el_blk = _gather_thin(el.astype(jnp.float32), blk.src)  # [nb*EB, H]
    e = el_blk
    if er is not None:
        er_rows = tile_rows_thin(
            _pad_rows(er.astype(jnp.float32), ntm), blk, interpret=interpret
        )
        e = e + er_rows
    lrelu_g = jnp.where(e >= 0, 1.0, negative_slope)
    e = e * lrelu_g

    slot_mask = (blk.dst_local < tm).reshape(-1)
    if keep_mask is not None:
        slot_mask = jnp.logical_and(slot_mask, keep_mask)
    a = _softmax_blocked(e, blk, slot_mask, interpret)
    a_drop = a
    if attn_keep is not None:
        a_drop = jnp.where(attn_keep, a / attn_keep_prob, 0.0)

    xf, dp = _pad_heads(feat, msg_dtype)
    # wide feature gather only starts once the thin attention pipeline is
    # done (concurrent HBM random-access streams thrash; see _after)
    a_drop, xf = _after(a_drop, xf)
    x_blk = gather(xf, blk.src)
    w3 = jnp.moveaxis(a_drop.reshape(nb, eb, h), 2, 1)  # [nb, H, EB]
    out = blocked_segment_sum_heads(
        x_blk, w3, blk, num_nodes, h, interpret=interpret
    )
    out = out.reshape(num_nodes, h, dp)[:, :, :d].astype(feat.dtype)
    return out, (a, a_drop, lrelu_g)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _gat_attention(feat, el, er, keep_mask, attn_keep, blk, tblk,
                   num_nodes: int, negative_slope: float,
                   attn_keep_prob: float, msg_dtype, interpret: bool):
    out, _ = _attention_fwd_impl(
        feat, el, er, keep_mask, attn_keep, blk, tblk,
        num_nodes, negative_slope, attn_keep_prob, msg_dtype, interpret,
    )
    return out


def _gat_attention_fwd(feat, el, er, keep_mask, attn_keep, blk, tblk,
                       num_nodes, negative_slope, attn_keep_prob,
                       msg_dtype, interpret):
    out, (a, a_drop, lrelu_g) = _attention_fwd_impl(
        feat, el, er, keep_mask, attn_keep, blk, tblk,
        num_nodes, negative_slope, attn_keep_prob, msg_dtype, interpret,
    )
    has_er = er is not None
    return out, (feat, a, a_drop, lrelu_g, keep_mask, attn_keep, blk, tblk,
                 has_er)


def _gat_attention_bwd(num_nodes, negative_slope, attn_keep_prob,
                       msg_dtype, interpret, res, g):
    from efficient_gnns_tpu.ops.pallas import (
        blocked_sddmm_dw_heads,
        blocked_segment_sum_heads,
        blocked_segment_sum_thin,
        tile_rows_thin,
    )

    (feat, a, a_drop, lrelu_g, keep_mask, attn_keep, blk, tblk, has_er) = res
    n, h, d = feat.shape
    nb, eb, tm = blk.num_blocks, blk.eb, blk.tm
    ntm = blk.num_tiles * tm

    g, feat = jax.lax.optimization_barrier((g, feat))
    gp, dp = _pad_heads(g, msg_dtype)
    xf, _ = _pad_heads(feat, msg_dtype)

    # dA (post-dropout) via per-(edge, head) row-dots against resident
    # cotangent tiles — no random gather of g.
    x_blk = gather(xf, blk.src)
    gt = _pad_rows(gp, ntm)
    da_drop = blocked_sddmm_dw_heads(gt, x_blk, blk, h, interpret=interpret)
    if attn_keep is not None:
        da = jnp.where(attn_keep, da_drop / attn_keep_prob, 0.0)
    else:
        da = da_drop

    # softmax VJP per segment: de = a * (da - sum_seg(a * da))
    inner = blocked_segment_sum_thin(a * da, blk, ntm, interpret=interpret)
    de = a * (da - tile_rows_thin(inner, blk, interpret=interpret))
    de = de * lrelu_g  # leaky-relu grad on the pre-activation logits

    # receiver-side logit grad: segment sum over destinations (fwd blocking)
    der = None
    if has_er:
        der = blocked_segment_sum_thin(de, blk, ntm, interpret=interpret)[:n]

    # ONE packed thin gather moves (a_drop, de) into the transpose layout:
    # a_drop weights the dX scatter; de feeds the sender-side logit grad.
    packed = jnp.concatenate([a_drop, de], axis=-1)  # [nb*EB, 2H]
    x_blk, packed = _after(x_blk, packed)
    packed_t = _gather_thin(packed, tblk.cross_perm)
    at_ = packed_t[:, :h]
    de_t = packed_t[:, h:]
    del_ = blocked_segment_sum_thin(
        de_t, tblk, tblk.num_tiles * tblk.tm, interpret=interpret
    )[:n]

    packed_t, gp = _after(packed_t, gp)
    g_blk = gather(gp, tblk.src)
    w3t = jnp.moveaxis(at_.reshape(tblk.num_blocks, tblk.eb, h), 2, 1)
    dx = blocked_segment_sum_heads(
        g_blk, w3t, tblk, num_nodes, h, interpret=interpret
    )
    dx = dx.reshape(num_nodes, h, dp)[:, :, :d].astype(feat.dtype)

    dkeep = None if keep_mask is None else float0_like(keep_mask)
    dattn = None if attn_keep is None else float0_like(attn_keep)
    return (
        dx,
        del_.astype(jnp.float32),
        der if der is None else der.astype(jnp.float32),
        dkeep,
        dattn,
        _tree_float0(blk),
        _tree_float0(tblk),
    )


_gat_attention.defvjp(_gat_attention_fwd, _gat_attention_bwd)


def supports_fused_attention(graph: Graph) -> bool:
    """True when the graph carries the blocked layouts (incl. ``cross_perm``)
    the fused attention path needs and the Pallas backend is enabled."""
    from efficient_gnns_tpu.ops import dispatch

    return (
        graph.blocking is not None
        and graph.t_blocking is not None
        and graph.hub is None
        and graph.t_blocking.cross_perm is not None
        and graph.blocking.inv_perm is not None
        and dispatch.pallas_enabled()
    )


def gat_attention(
    graph: Graph,
    feat_src: jnp.ndarray,  # [N, H, D] source-side (message) features
    el: jnp.ndarray,  # [N, H] sender attention logits
    er: Optional[jnp.ndarray] = None,  # [N, H] receiver logits (attn-dst)
    *,
    negative_slope: float = 0.2,
    keep_mask: Optional[jnp.ndarray] = None,  # bool[nb*EB] edge-drop keep
    attn_keep: Optional[jnp.ndarray] = None,  # bool[nb*EB, H] attn-dropout keep
    attn_keep_prob: float = 1.0,
) -> jnp.ndarray:
    """``out[r, h] = sum_e softmax_r(leaky_relu(el[s_e,h] + er[r,h])) * feat_src[s_e, h]``.

    Masks are in *blocked* slot order (``sample_edge_masks`` helper)."""
    from efficient_gnns_tpu.ops import dispatch

    assert supports_fused_attention(graph), "graph lacks blocked attention layouts"
    return _gat_attention(
        feat_src, el, er, keep_mask, attn_keep,
        graph.blocking, graph.t_blocking,
        graph.num_nodes, float(negative_slope), float(attn_keep_prob),
        dispatch.message_dtype(), dispatch.interpret_mode(),
    )


def sample_edge_masks(graph: Graph, rng, edge_drop: float = 0.0,
                      attn_drop: float = 0.0, num_heads: int = 1):
    """Sample (keep_mask, attn_keep) in blocked slot order for
    :func:`gat_attention`. Returns (None, None) entries for zero rates."""
    blk = graph.blocking
    slots = blk.num_blocks * blk.eb
    keep = attn = None
    if edge_drop > 0 or attn_drop > 0:
        k1, k2 = jax.random.split(rng)
        if edge_drop > 0:
            keep = jax.random.bernoulli(k1, 1.0 - edge_drop, (slots,))
        if attn_drop > 0:
            attn = jax.random.bernoulli(k2, 1.0 - attn_drop, (slots, num_heads))
    return keep, attn
