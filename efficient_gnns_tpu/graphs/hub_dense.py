"""Hub-dense adjacency decomposition: scatter/gather -> MXU matmuls.

TPU row-gathers are latency-bound (~2.5 ns/row on v5e regardless of dtype or
index locality), so SpMM over a power-law graph pays most of its time
enumerating edges of a few hub nodes. Real citation/social graphs (ogbn-arxiv
included) are heavy-tailed: the top ~256 nodes touch 40-80% of all edges.

This module splits the adjacency ``A = R + S + D``:

* ``S`` — edges whose *sender* is one of the top ``h_src`` out-degree hubs,
  stored as a dense ``m_src: f32[N, h_src]`` with ``m_src[r, hub(s)] = w``.
  Contribution ``S @ x = m_src @ x[hub_src]`` — one skinny MXU matmul, zero
  gathers, zero scatters.
* ``D`` — remaining edges whose *receiver* is a top-``h_dst`` in-degree hub,
  stored as ``m_dst: f32[h_dst, N]``. Contribution rows
  ``(D @ x)[hub_dst] = m_dst @ x`` — an N-deep reduction matmul.
* ``R`` — the residual (~20% of edges for arxiv-like tails), which keeps the
  gather + blocked one-hot scatter path (ops/pallas/segment_matmul.py).

The dense slices are ~2% occupied, i.e. ~50x redundant FLOPs/bytes — and
still ~5x faster than edge enumeration, because the MXU runs at ~130 TFLOP/s
while the gather engine issues 0.4 G rows/s. Measured on TPU v5e, ogbn-arxiv
shape (1.88M edges, F=128): SpMM fwd+bwd 20.0 ms -> 7.7 ms.

The reference has no analog (its SpMM floor is cuSPARSE/torch-scatter, see
SURVEY.md §2.4); this is a TPU-native speed-of-light play. Transposes need no
extra storage: both hub slices transpose by swapping contraction dims.

Only static-weight / unweighted SpMM uses the decomposition (GCN norm, SAGE,
SIGN precompute, mean aggregation). Runtime-weighted SpMM (GAT attention)
would need a per-step dense refill scatter — build those graphs without it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HubDense:
    """Dense hub slices of the adjacency plus refill indices.

    ``transposed`` flips the roles of the two slices (set by
    ``Graph.transpose()``); the matmuls swap contraction dims instead of
    materializing array transposes.
    """

    hub_src: jnp.ndarray  # int32[Hs] hub sender node ids
    m_src: jnp.ndarray  # f32[N_pad, Hs]; m_src[r, j] = w(hub_src[j] -> r)
    hub_dst: jnp.ndarray  # int32[Hd] hub receiver node ids
    m_dst: jnp.ndarray  # f32[Hd, N_pad]; m_dst[i, s] = w(s -> hub_dst[i])
    # refill indices (exact length, no padding): positions of the hub edges
    # in the graph's receiver-sorted (CSR) edge arrays, so the dense values
    # can be rebuilt from any CSR-ordered edge_weight vector.
    src_rows: jnp.ndarray  # int32[Ehs] receiver of each S edge
    src_cols: jnp.ndarray  # int32[Ehs] hub-local sender of each S edge
    src_eids: jnp.ndarray  # int32[Ehs] CSR edge index of each S edge
    dst_rows: jnp.ndarray  # int32[Ehd] hub-local receiver of each D edge
    dst_cols: jnp.ndarray  # int32[Ehd] sender of each D edge
    dst_eids: jnp.ndarray  # int32[Ehd] CSR edge index of each D edge
    transposed: bool = struct.field(pytree_node=False, default=False)
    # True when the dense values are raw edge multiplicities (built without
    # edge weights) — required by ops/hub_attention.py, whose softmax math
    # treats the slices as adjacency structure, not weighted values.
    unit_values: bool = struct.field(pytree_node=False, default=False)

    def transpose(self) -> "HubDense":
        return self.replace(transposed=not self.transposed)


def _dense_precision(dtype):
    # f32 operands need the bf16x3+ passes for allclose-grade accuracy
    # (measured rel err 8.5e-7 vs 1.1e-3 single-pass at arxiv scale); the
    # extra passes cost <5% end to end. bf16 inputs take the fast path.
    return (
        jax.lax.Precision.DEFAULT
        if dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dense_precision(b.dtype),
    )


def hub_contribution(hub: HubDense, x: jnp.ndarray) -> jnp.ndarray:
    """``(S + D) @ x`` (or its transpose) as dense MXU matmuls.

    Returns float32[N_pad, F]; the caller adds the residual SpMM.
    """
    if not hub.transposed:
        # S @ x: [N, Hs] @ [Hs, F]
        out = _dot(hub.m_src, x[hub.hub_src], ((1,), (0,)))
        # (D @ x)[hub_dst]: [Hd, N] @ [N, F]
        rows = _dot(hub.m_dst, x, ((1,), (0,)))
        return out.at[hub.hub_dst].add(rows, unique_indices=True)
    # S^T x: rows hub_src get m_src^T @ x = contract over dim 0
    rows = _dot(hub.m_src, x, ((0,), (0,)))  # [Hs, F]
    # D^T x: m_dst^T @ x[hub_dst] = contract over dim 0
    out = _dot(hub.m_dst, x[hub.hub_dst], ((0,), (0,)))  # [N, F]
    return out.at[hub.hub_src].add(rows, unique_indices=True)


def refresh_hub_weights(hub: HubDense, w_csr: jnp.ndarray) -> HubDense:
    """Rebuild the dense values from a CSR-ordered edge-weight vector.

    One-time per weight change (a 2-D scatter-add of the hub edges); runs on
    device so freshly computed weights (e.g. GCN normalization) need no
    host readback.
    """
    w = w_csr.astype(jnp.float32)
    m_src = (
        jnp.zeros(hub.m_src.shape, jnp.float32)
        .at[hub.src_rows, hub.src_cols]
        .add(w[hub.src_eids])
    )
    m_dst = (
        jnp.zeros(hub.m_dst.shape, jnp.float32)
        .at[hub.dst_rows, hub.dst_cols]
        .add(w[hub.dst_eids])
    )
    return hub.replace(m_src=m_src, m_dst=m_dst, unit_values=False)


def _top_k(counts: np.ndarray, k: int) -> np.ndarray:
    """Top-k ids by count, deterministic (ties broken by node id)."""
    k = min(k, counts.shape[0])
    idx = np.argpartition(-counts, k - 1)[:k]
    return idx[np.lexsort((idx, -counts[idx]))].astype(np.int32)


def partition_hub_edges(
    s_csr: np.ndarray,
    r_csr: np.ndarray,
    num_nodes: int,
    h_src: int = 256,
    h_dst: int = 256,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split CSR-ordered edges into (S, D, residual) by hub membership.

    Returns ``(hub_src_ids, hub_dst_ids, src_mask, dst_mask)`` —
    the residual mask is ``~(src_mask | dst_mask)``.
    """
    cnt_s = np.bincount(s_csr, minlength=num_nodes)
    hub_src = _top_k(cnt_s, h_src)
    is_hs = np.zeros(num_nodes, bool)
    is_hs[hub_src] = True
    src_mask = is_hs[s_csr]
    cnt_r = np.bincount(r_csr[~src_mask], minlength=num_nodes)
    hub_dst = _top_k(cnt_r, h_dst)
    is_hd = np.zeros(num_nodes, bool)
    is_hd[hub_dst] = True
    dst_mask = ~src_mask & is_hd[r_csr]
    return hub_src, hub_dst, src_mask, dst_mask


def build_hub_dense(
    s_csr: np.ndarray,
    r_csr: np.ndarray,
    num_nodes: int,
    n_pad: int,
    h_src: int = 256,
    h_dst: int = 256,
    edge_weight: Optional[np.ndarray] = None,
) -> Tuple[HubDense, np.ndarray]:
    """Build the decomposition from host CSR-ordered edges.

    ``edge_weight`` (CSR order, host) fills the dense values; ``None`` means
    unweighted (values = edge multiplicities).

    Returns ``(HubDense, residual_mask)`` with ``residual_mask`` over the
    CSR-ordered edges.
    """
    hub_src, hub_dst, src_mask, dst_mask = partition_hub_edges(
        s_csr, r_csr, num_nodes, h_src, h_dst
    )
    hs, hd = hub_src.shape[0], hub_dst.shape[0]
    hl_s = np.zeros(num_nodes, np.int64)
    hl_s[hub_src] = np.arange(hs)
    hl_d = np.zeros(num_nodes, np.int64)
    hl_d[hub_dst] = np.arange(hd)

    w = (
        np.ones(s_csr.shape[0], np.float32)
        if edge_weight is None
        else np.asarray(edge_weight, np.float32)
    )
    src_eids = np.nonzero(src_mask)[0].astype(np.int32)
    dst_eids = np.nonzero(dst_mask)[0].astype(np.int32)
    src_rows = r_csr[src_eids].astype(np.int32)
    src_cols = hl_s[s_csr[src_eids]].astype(np.int32)
    dst_rows = hl_d[r_csr[dst_eids]].astype(np.int32)
    dst_cols = s_csr[dst_eids].astype(np.int32)

    # Materialize the dense slices ON DEVICE from the (already device-bound)
    # refill indices: the slices are the dominant upload of a hub graph
    # (2 * n_pad * 256 * 4 B ~ 350 MB at arxiv shape) while the scatter
    # inputs are ~25 MB — through a tunneled TPU backend the host->device
    # transfer, not the host build, is what costs minutes (measured ~37 MB/s
    # with multi-second flush stalls under relay load).
    d_src_rows = jnp.asarray(src_rows)
    d_src_cols = jnp.asarray(src_cols)
    d_src_eids = jnp.asarray(src_eids)
    d_dst_rows = jnp.asarray(dst_rows)
    d_dst_cols = jnp.asarray(dst_cols)
    d_dst_eids = jnp.asarray(dst_eids)
    d_w = jnp.asarray(w)
    # multiplicities are small integers — exact in bfloat16 and half the
    # HBM footprint (hub attention casts per step anyway)
    out_dtype = jnp.bfloat16 if edge_weight is None else jnp.float32

    @jax.jit
    def _fill(w, src_rows, src_cols, src_eids, dst_rows, dst_cols, dst_eids):
        m_src = (
            jnp.zeros((n_pad, hs), jnp.float32)
            .at[src_rows, src_cols].add(w[src_eids])
        )
        m_dst = (
            jnp.zeros((hd, n_pad), jnp.float32)
            .at[dst_rows, dst_cols].add(w[dst_eids])
        )
        return m_src.astype(out_dtype), m_dst.astype(out_dtype)

    m_src, m_dst = _fill(d_w, d_src_rows, d_src_cols, d_src_eids,
                         d_dst_rows, d_dst_cols, d_dst_eids)

    hub = HubDense(
        hub_src=jnp.asarray(hub_src),
        m_src=m_src,
        hub_dst=jnp.asarray(hub_dst),
        m_dst=m_dst,
        src_rows=d_src_rows,
        src_cols=d_src_cols,
        src_eids=d_src_eids,
        dst_rows=d_dst_rows,
        dst_cols=d_dst_cols,
        dst_eids=d_dst_eids,
        unit_values=edge_weight is None,
    )
    return hub, ~(src_mask | dst_mask)


def auto_hub_size(
    num_nodes_padded: int,
    num_edges: int,
    budget_bytes: int = 600 * 1024 * 1024,
    min_edges: int = 200_000,
    itemsize: int = 2,
    widths=(512, 256),
) -> int:
    """Default hub width: the widest of ``widths`` whose dense slices fit
    the HBM budget (0 when the graph is too small for the split to pay for
    itself). ``itemsize``: slice element bytes — 2 for unit-valued
    (multiplicity, bf16) slices, 4 for f32 weighted slices. 512 moves ~13%
    more edges off the residual gather than 256 at arxiv scale for ~2x
    slice memory — a win for wide attention pipelines (46.2 -> 33.8 ms on
    the 1-layer GAT fwd+bwd across the round-5 z-fold + widening), a small
    loss for narrow 128-lane GCN streams (the caller picks the width set;
    see graphs/preprocess.py)."""
    if num_edges < min_edges:
        return 0
    for h in widths:
        if num_nodes_padded * (2 * h) * itemsize <= budget_bytes:
            return h
    return 0
