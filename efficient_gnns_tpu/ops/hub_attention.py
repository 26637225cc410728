"""Hub-dense GAT attention: softmax aggregation as static-structure matmuls.

TPU-native fast path for the flagship GAT-teacher configuration
(``--no-attn-dst``, reference ``arxiv_dgl/models.py:199-204`` — the attention
logit uses only the *source* projection). The key identity: when the per-edge
logit ``e = leaky_relu(el[s])`` depends on the sender alone,

    softmax_r(e)[s -> r] = z[s] / sum_{s' -> r} z[s'],   z = exp(e - m)

so the whole SDDMM -> edge-softmax -> weighted-SpMM pipeline collapses to

    out[r] = (A @ (z * x))[r] / (A @ z)[r]

two SpMMs over the *static* adjacency — no per-edge arrays, no wide row
gather over all edges. With the hub-dense decomposition
(graphs/hub_dense.py) the dominant hub edges run as dense MXU matmuls from
VMEM-resident hub features; only the residual edges (the power-law tail)
take the gather + blocked one-hot-scatter path. The numerator and
denominator share one 128-padded concatenated pipeline ``y = [z*x | z]``.

The row gather is the TPU's hard floor here — the gather engine issues
~0.4G rows/s regardless of dtype (measured v5e, see graphs/hub_dense.py) —
so eliminating the per-edge gather for hub edges is worth ~10x at
arxiv scale over the per-edge fused path (ops/attention.py), which remains
the general path for destination-dependent logits / attention dropout.

Edge-drop (``arxiv_dgl/models.py:207-214``: drop a random edge subset
*before* softmax normalization) is reproduced exactly in expectation and
per-edge-iid by Bernoulli keep masks applied to the static structure:

* hub slices: dense masks ``B ~ Bernoulli(keep)`` over the [N, H_s] /
  [H_d, N] cells (cells without an edge are already 0 in the slice);
* residual edges: a counter-based hash of the edge's CSR id — the forward
  blocking and the transpose blocking (backward pass) hash the *same* edge
  ids, so both layouts see an identical kept-edge set with zero cross-layout
  permutation traffic.

Hub edge-drop granularity caveat: the dense-grid mask is Bernoulli per
*(receiver, hub-sender) cell*, not per parallel edge — multi-edges that were
accumulated into one cell (multiplicity >= 2) are kept or dropped jointly.
Graphs built through :func:`graphs.preprocess.build_graph` with
``bidirected=True`` are deduplicated, so every cell holds at most one edge
and the mask is exactly per-edge iid; only hand-built multigraphs see the
joint-drop deviation. Grid cells are hashed row-then-column (two rounds of
the avalanche hash), so there is no uint32 index wrap at any graph size.

Numerical stability uses a *global* per-head max (``stop_gradient``) instead
of the per-destination segment max: mathematically identical (softmax is
invariant to any constant shift; a global constant is constant within every
segment), and safe in float32/bfloat16 range unless per-head logit spread
exceeds ~80 nats (never observed in GAT training; the denominator is
guarded). This is the documented deviation from ``dgl.ops.edge_softmax``.

Messages ride in ``dispatch.hub_message_dtype()`` — default bfloat16 with
float32 accumulation (halves the path's HBM traffic; ~1e-2 max rel err vs
float32 at arxiv shape, see bench.py's error line). Pin
``set_backend(hub_message_dtype=jnp.float32)`` for exactness tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops.segment import float0_like, gather

_TINY = 1e-20


def _tree_float0(tree):
    return jax.tree_util.tree_map(float0_like, tree)


# ---------------------------------------------------------------------------
# Counter-based Bernoulli keep masks (stateless, layout-independent)
# ---------------------------------------------------------------------------


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap avalanche hash (lowbias32) on uint32 lanes."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _keep_thresh(keep_prob: float) -> int:
    return min(int(keep_prob * 2.0**32), 2**32 - 1)


def edge_keep_mask(eids: jnp.ndarray, seed: jnp.ndarray, keep_prob: float,
                   salt: int = 0) -> jnp.ndarray:
    """bool mask, iid Bernoulli(keep_prob) per *edge id* — identical for the
    same edge id in any layout (forward blocked, transpose blocked, dense
    hub grid), which is what makes the masked backward pass consistent."""
    h = _hash_u32(eids.astype(jnp.uint32) ^ (seed + jnp.uint32(salt)))
    return h < jnp.uint32(_keep_thresh(keep_prob))


def _grid_keep_mask(rows: int, cols: int, seed: jnp.ndarray, keep_prob: float,
                    salt: int) -> jnp.ndarray:
    """bool[rows, cols] iid Bernoulli(keep_prob) over a dense hub grid.

    Row and column indices are hashed in two chained rounds instead of a
    single ``row * cols + col`` cell id, so the mask never aliases from
    uint32 index wrap however large the grid is."""
    hrow = _hash_u32(
        jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0)
        ^ (seed + jnp.uint32(salt))
    )
    h = _hash_u32(hrow ^ jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1))
    return h < jnp.uint32(_keep_thresh(keep_prob))


# ---------------------------------------------------------------------------
# Residual SpMM with hashed Bernoulli edge masks (custom VJP)
# ---------------------------------------------------------------------------


def _mask_w_blk(blk, seed, keep_prob: float):
    if keep_prob >= 1.0:
        return None
    eids = blk.csr_perm if blk.csr_perm is not None else blk.edge_id
    nb, eb = blk.num_blocks, blk.eb
    keep = edge_keep_mask(eids, seed, keep_prob, salt=0x5EED)
    return keep.reshape(nb, eb).astype(jnp.float32)


def _masked_scatter(y, blk, seed, keep_prob, num_nodes, msg_dtype, interpret):
    from efficient_gnns_tpu.ops.pallas import blocked_segment_sum

    y = jax.lax.optimization_barrier(y)  # keep the gather un-fused
    msgs = gather(y.astype(msg_dtype), blk.src)
    w_blk = _mask_w_blk(blk, seed, keep_prob)
    return blocked_segment_sum(
        msgs, blk, num_nodes, w=w_blk, interpret=interpret
    )


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _spmm_masked(y, seed, blk, tblk, keep_prob: float, num_nodes: int,
                 msg_dtype, interpret: bool):
    """``out = A_kept @ y`` where ``A_kept`` is the (residual-)blocked
    adjacency with hashed-Bernoulli edge drops. float32 output."""
    return _masked_scatter(y, blk, seed, keep_prob, num_nodes, msg_dtype,
                           interpret)


def _spmm_masked_fwd(y, seed, blk, tblk, keep_prob, num_nodes, msg_dtype,
                     interpret):
    out = _masked_scatter(y, blk, seed, keep_prob, num_nodes, msg_dtype,
                          interpret)
    return out, (jnp.zeros((0,), y.dtype), seed, blk, tblk)


def _spmm_masked_bwd(keep_prob, num_nodes, msg_dtype, interpret, res, g):
    dtype_carrier, seed, blk, tblk = res
    dy = _masked_scatter(g, tblk, seed, keep_prob, num_nodes, msg_dtype,
                         interpret).astype(dtype_carrier.dtype)
    return (dy, float0_like(seed), _tree_float0(blk), _tree_float0(tblk))


_spmm_masked.defvjp(_spmm_masked_fwd, _spmm_masked_bwd)


# ---------------------------------------------------------------------------
# The hub attention op
# ---------------------------------------------------------------------------


def _matmul_precision(dtype):
    return (
        jax.lax.Precision.DEFAULT
        if dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _dot(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=_matmul_precision(b.dtype),
    )


def supports_hub_attention(graph: Graph) -> bool:
    """True when the hub-dense + residual-blocked layouts needed by
    :func:`hub_gat_attention` are present and the Pallas backend is on."""
    from efficient_gnns_tpu.ops import dispatch

    return (
        graph.hub is not None
        and graph.blocking is not None
        and graph.t_blocking is not None
        and not graph.hub.transposed
        and graph.hub.unit_values  # slices must be multiplicities, not weights
        and dispatch.pallas_enabled()
    )


def hub_gat_attention(
    graph: Graph,
    feat_src: jnp.ndarray,  # [N, H, D] source-side (message) features
    el: jnp.ndarray,  # [N, H] sender attention logits
    *,
    negative_slope: float = 0.2,
    edge_drop: float = 0.0,
    drop_seed: Optional[jnp.ndarray] = None,  # uint32 scalar; None = no drop
) -> jnp.ndarray:
    """``out[r,h] = sum_e softmax_r(leaky_relu(el[s_e,h])) * feat_src[s_e,h]``
    over kept edges — sender-only logits (``use_attn_dst=False``), matching
    ``arxiv_dgl/models.py:199-218`` with ``--no-attn-dst``.

    Requires :func:`supports_hub_attention`. ``drop_seed`` activates
    hashed-Bernoulli edge-drop with keep probability ``1 - edge_drop``
    (sampled before softmax normalization, reference models.py:207-214).
    """
    from efficient_gnns_tpu.ops import dispatch

    if not supports_hub_attention(graph):
        raise ValueError(
            "graph lacks hub attention layouts — build it with "
            "block=True, hub_dense>0 and no static edge weights "
            "(see supports_hub_attention)"
        )
    hub = graph.hub
    blk, tblk = graph.blocking, graph.t_blocking
    n_pad = graph.num_nodes
    n, h, d = feat_src.shape
    dp = ((d + 127) // 128) * 128
    # z-fold (r5 gather lever): when the feature dim leaves padding slack
    # (d < dp, the flagship d=250 case), the softmax numerator z rides in
    # column d of each head's 128-padded block — the pipeline is h*dp wide
    # (768 at teacher shape) instead of h*dp + 128 (896), shaving ~14% off
    # every residual row gather (fwd + transpose bwd) and both hub matmuls.
    # Only when d is an exact lane multiple does z need its own block.
    z_fold = d < dp
    hp = 0 if z_fold else ((h + 127) // 128) * 128
    md = dispatch.hub_message_dtype()
    interpret = dispatch.interpret_mode()
    keep_prob = 1.0 - float(edge_drop)
    dropping = drop_seed is not None and edge_drop > 0.0

    # z[s, h] = exp(leaky_relu(el) - m): softmax numerator per sender. The
    # global (per-head) max shift is exact for softmax and stop-gradient.
    # The -60 floor keeps every z normal-range f32 (z >= 8.7e-27): without
    # it a receiver whose kept senders sit ~90+ nats below the global max
    # gets a subnormal denominator, the cotangent g/den overflows to inf,
    # and inf * z -> NaN poisons the step (observed once per ~100 epochs at
    # arxiv scale). Semantics change only for receivers *entirely* >60 nats
    # below the global max — their edge weights flatten toward uniform,
    # the documented deviation from exact per-segment softmax.
    e = jax.nn.leaky_relu(el.astype(jnp.float32), negative_slope)
    m = jax.lax.stop_gradient(jnp.max(e, axis=0, keepdims=True))
    z = jnp.exp(jnp.maximum(e - m, -60.0))  # [N, H]

    # one concatenated pipeline: y = [z * x | z] per head (z in the padding
    # lane when z_fold, in a trailing 128-block otherwise)
    zx = feat_src.astype(jnp.float32) * z[:, :, None]
    if z_fold:
        zx = jnp.concatenate([zx, z[:, :, None]], axis=-1)
        if dp != d + 1:
            zx = jnp.pad(zx, ((0, 0), (0, 0), (0, dp - d - 1)))
        y = zx.reshape(n, h * dp)
    else:
        if dp != d:
            zx = jnp.pad(zx, ((0, 0), (0, 0), (0, dp - d)))
        zpad = jnp.pad(z, ((0, 0), (0, hp - h)))
        y = jnp.concatenate([zx.reshape(n, h * dp), zpad], axis=-1)
    if n_pad > n:
        y = jnp.pad(y, ((0, n_pad - n), (0, 0)))
    y = y.astype(md)

    # --- hub-S: senders in the top out-degree set (dense [N, Hs] slice) ---
    m_src = hub.m_src.astype(md)
    if dropping:
        b = _grid_keep_mask(m_src.shape[0], m_src.shape[1], drop_seed,
                            keep_prob, salt=0x51)
        m_src = jnp.where(b, m_src, jnp.zeros((), md))
    total = _dot(m_src, y[hub.hub_src])  # [N_pad, H*Dp + 128]

    # --- hub-D: receivers in the top in-degree set (dense [Hd, N] slice) ---
    m_dst = hub.m_dst.astype(md)
    if dropping:
        b = _grid_keep_mask(m_dst.shape[0], m_dst.shape[1], drop_seed,
                            keep_prob, salt=0xD5)
        m_dst = jnp.where(b, m_dst, jnp.zeros((), md))
    rows = _dot(m_dst, y)  # [Hd, H*Dp + 128]
    total = total.at[hub.hub_dst].add(rows, unique_indices=True)

    # --- residual tail: gather + blocked one-hot scatter, hashed edge-drop --
    seed = drop_seed if dropping else jnp.uint32(0)
    res_keep = keep_prob if dropping else 1.0
    total = total + _spmm_masked(
        y, seed, blk, tblk, res_keep, n_pad, md, interpret
    )

    if z_fold:
        blocks = total[:n].reshape(n, h, dp)
        num = blocks[:, :, :d]
        den = blocks[:, :, d]  # [N, H] — the folded z lane
    else:
        num = total[:n, : h * dp].reshape(n, h, dp)[:, :, :d]
        den = total[:n, h * dp : h * dp + h]  # first h of the hp block
    return _normalize(num, den).astype(feat_src.dtype)


@jax.custom_vjp
def _normalize(num, den):
    """``num / den`` per (node, head), 0 (with zero gradient) for empty
    segments — DGL's empty-segment edge_softmax semantics.

    Custom VJP because autodiff of a plain division computes
    ``dden = -g * num / den**2`` and ``den**2`` underflows to 0 for
    ``den < ~1e-19`` (tiny-but-nonzero denominators are routine once
    training sharpens the attention logits), sending inf/NaN into the
    parameters — observed as a sudden single-step NaN at arxiv scale. The
    backward here reuses the forward output, so ``den`` is only ever
    reciprocated once: ``dden = -(g . out) / den``, bounded whenever
    ``out`` is."""
    pos = (den > 0.0)[:, :, None]
    return jnp.where(pos, num, 0.0) / jnp.where(pos, den[:, :, None], 1.0)


def _normalize_fwd(num, den):
    out = _normalize(num, den)
    return out, (out, den)


def _normalize_bwd(res, g):
    out, den = res
    pos = (den > 0.0)[:, :, None]
    inv = jnp.where(pos, 1.0, 0.0) / jnp.where(pos, den[:, :, None], 1.0)
    dnum = g * inv
    dden = -jnp.sum(g * out, axis=-1) * inv[:, :, 0]
    return dnum, dden


_normalize.defvjp(_normalize_fwd, _normalize_bwd)
