"""Host-side graph construction and preprocessing.

Replaces the reference's DGL/PyG graph transforms — ``to_bidirected`` /
``add_self_loop`` / ``create_formats_`` (``arxiv_dgl/gat.py:56-71``) and
``ToSparseTensor`` / ``to_symmetric`` (``arxiv_pyg/gnn.py:236-249``) — with
NumPy preprocessing that emits static-shape, receiver-sorted padded COO plus
CSR/CSC offsets ready for device upload (see graphs/container.py).

All functions here run once per dataset on the host; nothing is traced.
"""

from __future__ import annotations

from contextlib import nullcontext as _nullcontext
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.container import Graph


def pad_length(n: int, multiple: int = 128) -> int:
    """Round ``n`` up to a multiple (TPU lane-friendly padding)."""
    if n == 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


def to_bidirected(
    senders: np.ndarray, receivers: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Add reverse edges and deduplicate (DGL ``to_bidirected`` semantics).

    Uses the C++ host runtime when built (native/gnns_host.cc), NumPy
    otherwise.
    """
    from efficient_gnns_tpu.native import host as _native

    return _native.to_bidirected(senders, receivers)


def add_self_loops(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Remove existing self loops, then add one per node."""
    keep = senders != receivers
    loop = np.arange(num_nodes, dtype=senders.dtype)
    return (
        np.concatenate([senders[keep], loop]),
        np.concatenate([receivers[keep], loop]),
    )


def _csr_offsets(sorted_rows: np.ndarray, num_rows: int) -> np.ndarray:
    """CSR offsets over an ascending row-id array (padding ids >= num_rows)."""
    from efficient_gnns_tpu.native import host as _native

    return _native.csr_offsets(np.asarray(sorted_rows, np.int32), num_rows)


def build_graph(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    edge_weight: Optional[np.ndarray] = None,
    edge_type: Optional[np.ndarray] = None,
    num_edge_types: int = 0,
    bidirected: bool = False,
    self_loops: bool = False,
    pad_nodes_to: Optional[int] = None,
    pad_edges_to: Optional[int] = None,
    edge_pad_multiple: int = 1024,
    n_node_valid: Optional[int] = None,
    block: bool = False,
    block_tm: int = 256,
    block_eb: Optional[int] = None,
    block_pad_to: Optional[int] = None,
    block_max_dst: Optional[int] = None,
    t_block_pad_to: Optional[int] = None,
    hub_dense="auto",
    gcn_norm: bool = False,
) -> Graph:
    """Build a device-ready :class:`Graph` from a raw COO edge list.

    Sorts edges by receiver (ties by sender), materializes the transpose
    (sender-sorted) order and both CSR offset arrays, and pads the edge list
    to a static shape with out-of-range sentinels.

    Args:
      pad_nodes_to: static node-dimension size (defaults to ``num_nodes``).
      pad_edges_to: static edge count; defaults to the edge count rounded up
        to ``edge_pad_multiple``.
      n_node_valid: number of valid nodes (defaults to ``num_nodes``) — use
        when the node set itself is padded.
      block: also build the Pallas edge blockings (graphs/blocking.py) from
        the host arrays before device upload.
      block_pad_to: pad both blockings' block counts to this static value
        (see ``blocking.max_blocks``) — samplers building one graph per step
        need sample-independent shapes or the jitted step retraces.
      block_max_dst: receivers are promised < this value — forward-blocking
        row tiles beyond it get no blocks (see ``build_blocking``
        ``max_dst_row``; the tall typed R-GCN layout). The transpose
        blocking (full receiver range) is unaffected; give it its own pad
        via ``t_block_pad_to`` when ``block_pad_to`` assumes the skip.
      gcn_norm: compute the symmetric GCN normalization
        ``d_r^-1/2 * d_s^-1/2`` host-side (NumPy) and attach it as
        ``edge_weight`` — identical result to calling
        :func:`gcn_norm_weights` afterwards, but orders of magnitude
        faster for large graphs (no per-op device dispatch; the weights
        are pre-blocked together with the edge layout before upload).
        The string ``"factored"`` instead stores the per-node scale
        ``d^-1/2`` (``Graph.node_scale``) and keeps the adjacency
        unweighted — identical math (``out = S A S x``), less HBM per
        SpMM (bf16 hub slices, no w_blk); preferred for TPU training.
      hub_dense: hub width for the hub-dense adjacency decomposition
        (graphs/hub_dense.py) — static-weight SpMM then runs the hub edges
        as dense MXU matmuls and only the residual edges through the
        blocked scatter. ``"auto"`` (default) enables width 256 for large
        graphs that fit the HBM budget; 0 disables. Only takes effect with
        ``block=True``. Build graphs that need *runtime* edge weights
        (GAT attention) with ``hub_dense=0``.
    """
    # The entire build is host-side: array constants, the hub-slice scatter
    # fill, and the cross-perm gather all land on the host CPU backend, then
    # ONE device_put ships the finished container. Without this, the interior
    # jit calls compile and execute on the default device — behind a remote
    # TPU tunnel that is minutes of remote compiles + piecemeal uploads for
    # an arxiv-scale graph (BENCH_r04: 216 s vs ~7 s host build).
    try:
        _cpu = jax.devices("cpu")[0]
    except RuntimeError:
        _cpu = None
    with jax.default_device(_cpu) if _cpu is not None else _nullcontext():
        g = _build_graph_host(
            senders, receivers, num_nodes,
            edge_weight=edge_weight, edge_type=edge_type,
            num_edge_types=num_edge_types, bidirected=bidirected,
            self_loops=self_loops, pad_nodes_to=pad_nodes_to,
            pad_edges_to=pad_edges_to, edge_pad_multiple=edge_pad_multiple,
            n_node_valid=n_node_valid, block=block, block_tm=block_tm,
            block_eb=block_eb, block_pad_to=block_pad_to,
            block_max_dst=block_max_dst, t_block_pad_to=t_block_pad_to,
            hub_dense=hub_dense, gcn_norm=gcn_norm,
        )
    default = jax.devices()[0]
    if _cpu is not None and default != _cpu:
        g = jax.device_put(g, default)  # one batched (lazily queued) upload
    return g


def _build_graph_host(
    senders, receivers, num_nodes, *, edge_weight, edge_type, num_edge_types,
    bidirected, self_loops, pad_nodes_to, pad_edges_to, edge_pad_multiple,
    n_node_valid, block, block_tm, block_eb, block_pad_to, block_max_dst,
    t_block_pad_to, hub_dense, gcn_norm,
) -> Graph:
    senders = np.asarray(senders, dtype=np.int64)
    receivers = np.asarray(receivers, dtype=np.int64)
    if bidirected:
        if edge_weight is not None or edge_type is not None:
            raise ValueError("bidirected=True incompatible with edge payloads")
        senders, receivers = to_bidirected(senders, receivers)
    if self_loops:
        if edge_weight is not None or edge_type is not None:
            raise ValueError("self_loops=True incompatible with edge payloads")
        senders, receivers = add_self_loops(senders, receivers, num_nodes)

    n_pad = int(pad_nodes_to) if pad_nodes_to is not None else int(num_nodes)
    if n_pad < num_nodes:
        raise ValueError(f"pad_nodes_to={n_pad} < num_nodes={num_nodes}")
    e = senders.shape[0]
    e_pad = (
        int(pad_edges_to) if pad_edges_to is not None else pad_length(e, edge_pad_multiple)
    )
    if e_pad < e:
        raise ValueError(f"pad_edges_to={e_pad} < num_edges={e}")

    from efficient_gnns_tpu.native import host as _native

    # Receiver-sorted (CSR) order; stable lexsort keeps sender ties ordered.
    csr_order = _native.lexsort_edges(senders, receivers, num_nodes)
    s_csr = senders[csr_order]
    r_csr = receivers[csr_order]

    # Sender-sorted (CSC / transpose) order, expressed as a permutation of
    # the CSR-ordered edges: t_receivers = s_csr[csc_perm].
    csc_perm = _native.lexsort_edges(r_csr, s_csr, num_nodes)
    t_s = r_csr[csc_perm]  # transpose senders = original receivers
    t_r = s_csr[csc_perm]  # transpose receivers = original senders

    def _pad_idx(a: np.ndarray) -> np.ndarray:
        out = np.full(e_pad, n_pad, dtype=np.int32)
        out[:e] = a
        return out

    pad_perm = np.arange(e_pad, dtype=np.int32)
    pad_perm[:e] = csc_perm

    ew = None
    node_scale = None
    if edge_weight is not None:
        ew = np.zeros(e_pad, dtype=np.float32)
        ew[:e] = np.asarray(edge_weight, dtype=np.float32)[csr_order]
    if gcn_norm:
        if ew is not None:
            raise ValueError("gcn_norm=True incompatible with edge_weight")
        deg = np.bincount(r_csr, minlength=n_pad).astype(np.float64)
        inv_sqrt = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1.0)), 0.0)
        if gcn_norm == "factored":
            # keep the adjacency unweighted and normalize via the diagonal
            # scales inside spmm (out = S A S x): the hub slices stay
            # bf16-exact multiplicities and no w_blk is built/read — less
            # HBM per step, identical math (d_r^-1/2 * d_s^-1/2 factors)
            node_scale = inv_sqrt.astype(np.float32)
        else:
            ew = np.zeros(e_pad, dtype=np.float32)
            ew[:e] = (inv_sqrt[s_csr] * inv_sqrt[r_csr]).astype(np.float32)
    et = None
    if edge_type is not None:
        et = np.full(e_pad, num_edge_types, dtype=np.int32)
        et[:e] = np.asarray(edge_type, dtype=np.int32)[csr_order]

    blocking = t_blocking = hub = None
    if block:
        from efficient_gnns_tpu.graphs.blocking import build_blocking, choose_eb
        from efficient_gnns_tpu.graphs.hub_dense import (
            auto_hub_size,
            build_hub_dense,
        )

        ew_host = None if ew is None else np.asarray(ew)
        # unit-valued (no static weights) hub slices are stored bf16 —
        # half the budget accounting of f32 weighted slices. Attention-style
        # graphs (no weights, no factored scales) carry WIDE per-head
        # message pipelines where the residual gather dominates, so they
        # take the widest hub (512 at arxiv scale: 33.8 vs 37.1 ms on the
        # 1-layer GAT fwd+bwd); weighted/factored GCN graphs stream narrow
        # 128-lane features where doubling the hub matmuls costs more than
        # the saved gather rows (0.751 vs 0.766 SoL measured), so they cap
        # at 256.
        wide_messages = ew is None and node_scale is None
        h = (auto_hub_size(
                n_pad, e,
                itemsize=2 if ew is None else 4,
                widths=(512, 256) if wide_messages else (256,))
             if hub_dense == "auto" else int(hub_dense))
        if h > 0:
            # Hub edges become dense MXU slices; only the residual edge set
            # gets blocked for the gather + one-hot-scatter path.
            hub, res_mask = build_hub_dense(
                s_csr, r_csr, num_nodes, n_pad, h_src=h, h_dst=h,
                edge_weight=None if ew_host is None else ew_host[:e],
            )
            res_ids = np.nonzero(res_mask)[0].astype(np.int64)
            s_b, r_b = s_csr[res_ids], r_csr[res_ids]  # still receiver-sorted
            e_b = s_b.shape[0]
            e_b_pad = pad_length(e_b, edge_pad_multiple)
            perm_b = _native.lexsort_edges(r_b, s_b, num_nodes)
            t_s_b, t_r_b = r_b[perm_b], s_b[perm_b]
            # map residual-local edge order -> full CSR order, so weight
            # refreshes (attach_blocked_weights) read the graph's CSR-ordered
            # edge_weight directly
            order_fwd = res_ids
            order_t = res_ids[perm_b]
            ew_b = None if ew_host is None else ew_host[:e][res_ids]
            ew_t_b = None if ew_b is None else ew_b[perm_b]
        else:
            s_b, r_b, t_s_b, t_r_b = s_csr, r_csr, t_s, t_r
            e_b, e_b_pad = e, e_pad
            order_fwd = None
            order_t = pad_perm
            ew_b = ew_host
            ew_t_b = None if ew_host is None else ew_host[pad_perm]

        def _pad_b(a: np.ndarray) -> np.ndarray:
            out = np.full(e_b_pad, n_pad, dtype=np.int32)
            out[:e_b] = a
            return out

        def _pad_order(o) -> Optional[np.ndarray]:
            if o is None:
                return None
            out = np.full(e_b_pad, e_pad, dtype=np.int32)
            out[: min(e_b, o.shape[0])] = o[:e_b]
            return out

        def _pad_w(wv) -> Optional[np.ndarray]:
            if wv is None:
                return None
            out = np.zeros(e_b_pad, dtype=np.float32)
            out[: min(e_b, wv.shape[0])] = wv[:e_b]
            return out

        eb = block_eb if block_eb is not None else choose_eb(
            _pad_b(r_b), n_pad, block_tm
        )
        blocking = build_blocking(
            _pad_b(s_b), _pad_b(r_b), n_pad, e_b_pad,
            tm=block_tm, eb=eb, edge_weight=_pad_w(ew_b),
            order_to_csr=_pad_order(order_fwd),
            pad_blocks_to=block_pad_to,
            max_dst_row=block_max_dst,
        )
        t_blocking = build_blocking(
            _pad_b(t_s_b), _pad_b(t_r_b), n_pad, e_b_pad,
            tm=block_tm, eb=eb,
            edge_weight=_pad_w(ew_t_b),
            order_to_csr=_pad_order(order_t),
            pad_blocks_to=(
                block_pad_to if t_block_pad_to is None else t_block_pad_to
            ),
        )
        from efficient_gnns_tpu.graphs.blocking import attach_cross_perm

        t_blocking = attach_cross_perm(blocking, t_blocking, e_b_pad)

    return Graph(
        senders=jnp.asarray(_pad_idx(s_csr)),
        receivers=jnp.asarray(_pad_idx(r_csr)),
        t_senders=jnp.asarray(_pad_idx(t_s)),
        t_receivers=jnp.asarray(_pad_idx(t_r)),
        csc_perm=jnp.asarray(pad_perm),
        row_offsets=jnp.asarray(_csr_offsets(r_csr, n_pad)),
        t_row_offsets=jnp.asarray(_csr_offsets(t_r, n_pad)),
        n_node=jnp.asarray(
            num_nodes if n_node_valid is None else n_node_valid, dtype=jnp.int32
        ),
        n_edge=jnp.asarray(e, dtype=jnp.int32),
        edge_weight=ew if ew is None else jnp.asarray(ew),
        edge_type=et if et is None else jnp.asarray(et),
        blocking=blocking,
        t_blocking=t_blocking,
        hub=hub,
        node_scale=None if node_scale is None else jnp.asarray(node_scale),
        num_nodes=n_pad,
        num_edge_types=int(num_edge_types),
    )


def induced_subgraph(
    senders: np.ndarray,
    receivers: np.ndarray,
    node_ids: np.ndarray,
    **build_kwargs,
) -> Graph:
    """Node-induced subgraph with relabeled, contiguous node ids.

    PyG ``subgraph(train_idx, edge_index, relabel_nodes=True)`` semantics
    (reference ``arxiv_pyg/gnn.py:246-249`` builds the LSP train subgraph
    this way). ``node_ids`` order defines the new labels.
    """
    node_ids = np.asarray(node_ids)
    n_total = int(max(senders.max(), receivers.max())) + 1 if len(senders) else 0
    n_total = max(n_total, int(node_ids.max()) + 1 if len(node_ids) else 0)
    relabel = np.full(n_total, -1, dtype=np.int64)
    relabel[node_ids] = np.arange(len(node_ids), dtype=np.int64)
    s = relabel[senders]
    r = relabel[receivers]
    keep = (s >= 0) & (r >= 0)
    return build_graph(s[keep], r[keep], len(node_ids), **build_kwargs)


def gcn_norm_weights(graph: Graph) -> Graph:
    """Attach symmetric GCN normalization weights ``d_r^-1/2 * d_s^-1/2``.

    Equivalent to PyG's ``GCNConv(cached=True)`` normalization
    (reference ``arxiv_pyg/gnn.py:28-35``) precomputed once — the cached
    normalized adjacency is then a static argument of the jitted step.
    Assumes self loops are already present if desired.
    """
    deg = graph.in_degrees()
    inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1.0)), 0.0)
    s = jnp.minimum(graph.senders, graph.num_nodes - 1)
    r = jnp.minimum(graph.receivers, graph.num_nodes - 1)
    w = inv_sqrt[s] * inv_sqrt[r]
    w = jnp.where(graph.edge_mask, w, 0.0)
    graph = graph.replace(edge_weight=w)
    if graph.blocking is not None:
        from efficient_gnns_tpu.graphs.blocking import attach_blocked_weights

        graph = attach_blocked_weights(graph)
    return graph
