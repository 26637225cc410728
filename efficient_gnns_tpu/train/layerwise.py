"""Layer-wise (chunked) R-GCN inference for full-graph evaluation at scale.

The reference evaluates ogbn-mag with a dedicated ``RGCN.inference`` path
(``mag_pyg/gnn.py:140-171``): layer by layer over the FULL graph, one
relation at a time, so peak memory stays at one layer's activations instead
of the whole unrolled forward. This is the TPU-native equivalent:

* receivers are split into fixed-size node chunks; per layer a single
  ``lax.scan`` walks the chunks, so the compiled program is one chunk wide
  and every chunk shares static shapes (edge arrays padded to the max chunk
  edge count host-side, once);
* inside a chunk, per-relation *mean* aggregation is ONE sorted
  ``segment_sum`` over typed segment ids ``rel * C + local_receiver``
  (edges pre-sorted host-side) followed by ONE batched MXU matmul against
  the stacked relation kernels ``[R, F_in, F_out]`` — aggregate-then-project
  (valid because mean commutes with the linear map), no R-pass edge
  enumeration and no ``[R * N, F]`` stacked feature table;
* per-node-type root linears and the trainable embedding injection follow
  ``models/gnns.py::RGCN`` exactly (same parameter tree).

Peak memory: input + output activations ([N, F]) plus O(chunk) temporaries —
the teacher-width (512) MAG forward fits where the naive full-graph forward
OOMs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RGCNLayerwiseInference:
    """Chunked full-graph inference against an ``RGCN`` parameter tree.

    Args:
      senders/receivers/edge_type: host int arrays of the full typed graph
        (COO, any order).
      num_nodes: total node count N (node features are [N, F]).
      num_edge_types: relation count R.
      chunk_nodes: receivers per chunk C (static); lower it for wide layers.
    """

    def __init__(
        self,
        senders: np.ndarray,
        receivers: np.ndarray,
        edge_type: np.ndarray,
        num_nodes: int,
        num_edge_types: int,
        chunk_nodes: int = 16384,
        edge_pad_multiple: int = 1024,
    ):
        s = np.asarray(senders, np.int64)
        r = np.asarray(receivers, np.int64)
        et = np.asarray(edge_type, np.int64)
        self.num_nodes = int(num_nodes)
        self.num_edge_types = int(num_edge_types)
        c = int(chunk_nodes)
        self.chunk_nodes = c
        n_chunks = -(-self.num_nodes // c)
        self.n_chunks = n_chunks
        n_pad = n_chunks * c

        # per-(relation, receiver) in-degree -> mean normalization weights
        deg = np.bincount(et * self.num_nodes + r,
                          minlength=self.num_edge_types * self.num_nodes)
        w = (1.0 / np.maximum(deg[et * self.num_nodes + r], 1)).astype(
            np.float32)

        # sort edges by (chunk, relation, local receiver): chunks contiguous,
        # typed segment ids sorted within each chunk
        chunk_of = r // c
        seg_local = et * c + (r % c)
        order = np.lexsort((seg_local, chunk_of))
        s, w, seg_local, chunk_of = (
            s[order], w[order], seg_local[order], chunk_of[order])

        counts = np.bincount(chunk_of, minlength=n_chunks)
        e_max = int(counts.max()) if len(counts) else 0
        e_max = max(edge_pad_multiple,
                    -(-e_max // edge_pad_multiple) * edge_pad_multiple)
        self.edge_budget = e_max

        # stacked per-chunk arrays [n_chunks, E_max]; padding edges carry
        # segment id R*C (dropped by num_segments) and weight 0
        snd = np.zeros((n_chunks, e_max), np.int32)
        seg = np.full((n_chunks, e_max),
                      self.num_edge_types * c, np.int32)
        wgt = np.zeros((n_chunks, e_max), np.float32)
        starts = np.zeros(n_chunks + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        for i in range(n_chunks):
            lo, hi = starts[i], starts[i + 1]
            snd[i, : hi - lo] = s[lo:hi]
            seg[i, : hi - lo] = seg_local[lo:hi]
            wgt[i, : hi - lo] = w[lo:hi]
        self._snd = jnp.asarray(snd)
        self._seg = jnp.asarray(seg)
        self._wgt = jnp.asarray(wgt)
        self._n_pad = n_pad
        self._layer_fns = {}

    # ------------------------------------------------------------------

    def _layer(self, h, rel_kernels):
        """One chunk-scanned relational aggregation + projection.

        ``out = sum_r W_r @ mean_{j -r-> i}(h_j)`` for every node i.
        ``rel_kernels``: float32[R, F_in, F_out].
        """
        c = self.chunk_nodes
        nr = self.num_edge_types

        def body(_, chunk):
            snd, seg, wgt = chunk
            msgs = h[snd] * wgt[:, None]  # [E_max, F_in]
            agg = jax.ops.segment_sum(
                msgs, seg, num_segments=nr * c, indices_are_sorted=True
            )  # [R*C, F_in]
            out_c = jnp.einsum(
                "rcf,rfo->co",
                agg.reshape(nr, c, -1),
                rel_kernels,
                precision=jax.lax.Precision.HIGHEST,
            )
            return None, out_c

        _, out = jax.lax.scan(body, None, (self._snd, self._seg, self._wgt))
        return out.reshape(self._n_pad, -1)[: self.num_nodes]

    def __call__(
        self,
        variables: dict,
        x: jnp.ndarray,
        node_type: jnp.ndarray,
        local_node_idx: jnp.ndarray,
        *,
        num_layers: int,
        num_node_types: int,
        emb_sizes=(),
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full-graph logits + penultimate features, layer by layer.

        ``variables`` is the ``RGCN`` flax variable dict ({"params": ...});
        the remaining kwargs mirror the module's static config so the
        parameter tree is interpreted identically (models/gnns.py:219-271).
        """
        p = variables["params"]
        h = x
        # trainable-embedding injection for featureless node types
        for type_id, size in emb_sizes:
            emb = p[f"emb_{type_id}"]
            rows = jnp.take(emb, jnp.clip(local_node_idx, 0, size - 1), axis=0)
            h = jnp.where((node_type == type_id)[:, None],
                          rows.astype(h.dtype), h)

        key = None
        out_feat = None
        for i in range(num_layers):
            conv = p[f"conv_{i}"]
            rel_kernels = jnp.stack([
                conv[f"rel_lin_{r}"]["kernel"]
                for r in range(self.num_edge_types)
            ])  # [R, F_in, F_out]
            key = (i, h.shape, rel_kernels.shape)
            fn = self._layer_fns.get(key)
            if fn is None:
                fn = jax.jit(self._layer)
                self._layer_fns[key] = fn
            out = fn(h, rel_kernels)
            # per-node-type root linears (dense, full-node)
            root = jnp.zeros_like(out)
            for t in range(num_node_types):
                rl = conv[f"root_lin_{t}"]
                term = h @ rl["kernel"] + rl["bias"]
                root = jnp.where((node_type == t)[:, None], term, root)
            h = out + root
            if i < num_layers - 1:
                h = jax.nn.relu(h)
                out_feat = h
        return h, out_feat
