"""Static-shape graph containers for XLA.

TPU-first design notes
----------------------
Everything under ``jit`` must have static shapes, so graphs are stored as
*padded COO sorted by receiver (destination)*:

* ``senders`` / ``receivers`` are ``int32[E_pad]`` edge endpoint arrays.
  Real edges come first, sorted ascending by ``receivers`` (ties broken by
  ``senders``), so segment reductions over destinations can use
  ``indices_are_sorted=True`` and Pallas kernels can walk contiguous
  per-destination runs.
* Padding edges carry ``receivers == num_nodes`` (one past the last valid
  node). JAX segment ops drop out-of-range ids, so padded edges vanish from
  every aggregation without a mask multiply; ``edge_mask`` is derived, not
  stored.
* The transpose graph (edges sorted by *sender*) is materialized once at
  build time (``t_senders`` / ``t_receivers`` + the permutation ``csc_perm``)
  because the VJP of SpMM w.r.t. node features is an SpMM over the transposed
  adjacency — the analog of DGL's ``create_formats_`` CSR/CSC pair
  (reference: ``arxiv_dgl/gat.py:56-71``).
* ``row_offsets`` is the CSR offset array over receivers (``int32[N+1]``),
  used by Pallas kernels and O(1) in-degree lookups.

The container is a ``flax.struct`` pytree: index arrays are leaves (live on
device), sizes are static aux data (hashable, part of the jit cache key).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Graph:
    """A padded, receiver-sorted COO graph with a materialized transpose.

    Attributes:
      senders: int32[E_pad] source node of each edge, sorted by receiver.
      receivers: int32[E_pad] destination node of each edge, ascending;
        padding entries equal ``num_nodes``.
      t_senders: int32[E_pad] senders of the *transpose* graph (i.e. the
        original receivers permuted into sender-sorted order).
      t_receivers: int32[E_pad] receivers of the transpose graph (original
        senders, ascending; padding == num_nodes).
      csc_perm: int32[E_pad] permutation with
        ``t_receivers == senders[csc_perm]`` — maps receiver-sorted edge
        values into sender-sorted order.
      row_offsets: int32[N+1] CSR offsets over ``receivers``.
      t_row_offsets: int32[N+1] CSR offsets over ``t_receivers``.
      edge_weight: optional float32[E_pad] per-edge scalar (e.g. the
        symmetric GCN normalization); padding entries are 0.
      edge_type: optional int32[E_pad] relation id per edge (R-GCN);
        padding entries equal ``num_edge_types``.
      n_node: traced int32 scalar — number of *valid* nodes (<= num_nodes);
        equals ``num_nodes`` for unpadded graphs, smaller for padded
        subgraphs (GraphSAINT) and batched graphs.
      n_edge: traced int32 scalar — number of valid edges.
      num_nodes: static padded node count (feature matrices are [num_nodes, F]).
      num_edge_types: static relation count (0 if homogeneous).
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    t_senders: jnp.ndarray
    t_receivers: jnp.ndarray
    csc_perm: jnp.ndarray
    row_offsets: jnp.ndarray
    t_row_offsets: jnp.ndarray
    n_node: jnp.ndarray
    n_edge: jnp.ndarray
    edge_weight: Optional[jnp.ndarray] = None
    edge_type: Optional[jnp.ndarray] = None
    # Factored symmetric normalization: out = S @ (A @ (S @ x)) with
    # S = diag(node_scale) — the GCN norm without per-edge weights, so the
    # adjacency structures stay unweighted (bf16-exact multiplicities in the
    # hub slices, no w_blk) and SpMM HBM traffic drops. Symmetric by
    # construction: transpose() keeps it as-is.
    node_scale: Optional[jnp.ndarray] = None
    # Pallas kernel edge blockings (graphs/blocking.py); None -> XLA path.
    # When ``hub`` is set the blockings cover only the residual edges.
    blocking: Optional[object] = None
    t_blocking: Optional[object] = None
    # Hub-dense adjacency slices (graphs/hub_dense.py); None -> pure sparse
    hub: Optional[object] = None
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_edge_types: int = struct.field(pytree_node=False, default=0)

    # ---- derived quantities ------------------------------------------------

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    @property
    def edge_mask(self) -> jnp.ndarray:
        """bool[E_pad] — True for real edges (receiver in range)."""
        return self.receivers < self.num_nodes

    @property
    def t_edge_mask(self) -> jnp.ndarray:
        return self.t_receivers < self.num_nodes

    @property
    def node_mask(self) -> jnp.ndarray:
        """bool[num_nodes] — True for valid (non-padding) nodes."""
        ids = jax.lax.broadcasted_iota(jnp.int32, (self.num_nodes, 1), 0)
        return (ids < self.n_node).squeeze(-1)

    def in_degrees(self) -> jnp.ndarray:
        """float32[num_nodes] in-degree of each node (0 for padding)."""
        return (self.row_offsets[1:] - self.row_offsets[:-1]).astype(jnp.float32)

    def out_degrees(self) -> jnp.ndarray:
        return (self.t_row_offsets[1:] - self.t_row_offsets[:-1]).astype(jnp.float32)

    def transpose(self) -> "Graph":
        """The transposed graph (receivers <-> senders).

        Cheap: both edge orders are already materialized, only the
        permutation is inverted and per-edge payloads re-sorted.
        """
        inv = jnp.zeros_like(self.csc_perm).at[self.csc_perm].set(
            jnp.arange(self.csc_perm.shape[0], dtype=self.csc_perm.dtype)
        )
        return Graph(
            senders=self.t_senders,
            receivers=self.t_receivers,
            t_senders=self.senders,
            t_receivers=self.receivers,
            csc_perm=inv,
            row_offsets=self.t_row_offsets,
            t_row_offsets=self.row_offsets,
            n_node=self.n_node,
            n_edge=self.n_edge,
            edge_weight=None
            if self.edge_weight is None
            else self.edge_weight[self.csc_perm],
            edge_type=None
            if self.edge_type is None
            else self.edge_type[self.csc_perm],
            blocking=self.t_blocking,
            t_blocking=self.blocking,
            hub=None if self.hub is None else self.hub.transpose(),
            node_scale=self.node_scale,  # symmetric: S A S transposes to itself
            num_nodes=self.num_nodes,
            num_edge_types=self.num_edge_types,
        )

    def permute_to_csc(self, edge_values: jnp.ndarray) -> jnp.ndarray:
        """Reorder per-edge values from receiver-sorted to sender-sorted order."""
        return edge_values[self.csc_perm]


@struct.dataclass
class BatchedGraphs:
    """A batch of graphs packed into one padded ``Graph`` (pad-and-mask).

    Used for inductive / graph-classification workloads (PPI graphs,
    ogbg-molhiv molecules — reference ``ppi_pyg/gnn.py:305-310`` uses a
    per-graph DataLoader; here whole batches are one static-shape graph so a
    single jitted step covers them).

    Attributes:
      graph: the packed Graph (node ids offset per segment).
      node_graph_ids: int32[num_nodes] graph index of each node
        (== num_graphs for padding nodes).
      n_graph: traced int32 — number of valid graphs in the batch.
      num_graphs: static padded graph count.
    """

    graph: Graph
    node_graph_ids: jnp.ndarray
    n_graph: jnp.ndarray
    num_graphs: int = struct.field(pytree_node=False, default=0)

    @property
    def graph_mask(self) -> jnp.ndarray:
        ids = jax.lax.broadcasted_iota(jnp.int32, (self.num_graphs, 1), 0)
        return (ids < self.n_graph).squeeze(-1)
