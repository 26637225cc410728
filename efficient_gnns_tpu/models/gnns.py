"""The GNN model zoo (node-classification families).

Every model's ``__call__`` returns ``(logits, out_feat)`` where ``out_feat``
is the representation used by feature-space distillation — the reference
captures it via a side-effect attribute during forward
(``arxiv_pyg/gnn.py:51``, ``arxiv_dgl/models.py:308``, ``sign.py:155``);
here it is an explicit second output (functional style, jit-friendly).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.models.layers import (
    DGLGATConv,
    ElementWiseLinear,
    FeedForwardNet,
    GCNConv,
    MaskedBatchNorm,
    PyGGATConv,
    RGCNConv,
    SAGEConv,
    relu_gain_xavier_uniform,
    xavier_uniform,
)


class GCN(nn.Module):
    """PyG-style GCN student (reference ``arxiv_pyg/gnn.py:23-53``):
    ``GCNConv -> BN -> ReLU -> dropout`` per hidden layer, ``out_feat`` =
    activations entering the final conv."""

    hidden: int
    out_feats: int
    num_layers: int
    dropout: float = 0.5
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        mask = graph.node_mask
        h = x
        for i in range(self.num_layers - 1):
            h = GCNConv(self.hidden, name=f"conv_{i}")(graph, h)
            h = MaskedBatchNorm(
                use_running_average=not training,
                axis_name=self.bn_axis_name,
                name=f"bn_{i}",
            )(h, mask)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        out_feat = h
        h = GCNConv(self.out_feats, name=f"conv_{self.num_layers - 1}")(graph, h)
        return h, out_feat


class SAGE(nn.Module):
    """PyG-style GraphSAGE student (reference ``arxiv_pyg/gnn.py:56-85``)."""

    hidden: int
    out_feats: int
    num_layers: int
    dropout: float = 0.5
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        mask = graph.node_mask
        h = x
        for i in range(self.num_layers - 1):
            h = SAGEConv(self.hidden, name=f"conv_{i}")(graph, h)
            h = MaskedBatchNorm(
                use_running_average=not training,
                axis_name=self.bn_axis_name,
                name=f"bn_{i}",
            )(h, mask)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        out_feat = h
        h = SAGEConv(self.out_feats, name=f"conv_{self.num_layers - 1}")(graph, h)
        return h, out_feat


class DGLGCN(nn.Module):
    """DGL-style GCN teacher baseline (reference ``arxiv_dgl/models.py:46-92``):
    symmetric-norm conv with optional per-layer parallel linear
    (``use_linear``), bias only on the final layer, input dropout
    ``min(0.1, dropout)``."""

    hidden: int
    out_feats: int
    num_layers: int
    dropout: float = 0.5
    use_linear: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        mask = graph.node_mask
        h = nn.Dropout(min(0.1, self.dropout), deterministic=not training)(x)
        out_feat = None
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            width = self.out_feats if last else self.hidden
            conv = GCNConv(width, use_bias=last, name=f"conv_{i}")(graph, h)
            if self.use_linear:
                conv = conv + nn.Dense(
                    width, use_bias=False, kernel_init=xavier_uniform,
                    name=f"linear_{i}",
                )(h)
            h = conv
            if not last:
                h = MaskedBatchNorm(
                    use_running_average=not training,
                    axis_name=self.bn_axis_name,
                    name=f"bn_{i}",
                )(h, mask)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
                out_feat = h
        return h, out_feat


class GATTeacher(nn.Module):
    """The ogbn-arxiv GAT teacher (reference ``arxiv_dgl/models.py:239-313``):
    3 layers x ``n_heads`` of :class:`DGLGATConv` with symmetric norm,
    residual linears, head-flatten + BN + ReLU + dropout between layers, a
    single-head final layer, head-mean and a bias-only
    :class:`ElementWiseLinear`. ``out_feat`` is the flattened activation
    after the penultimate layer (the 750-d teacher dump feature,
    ``arxiv_dgl/models.py:308``)."""

    hidden: int
    out_feats: int
    num_layers: int = 3
    num_heads: int = 3
    dropout: float = 0.75
    input_drop: float = 0.0
    attn_drop: float = 0.0
    edge_drop: float = 0.0
    use_attn_dst: bool = True
    use_symmetric_norm: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        mask = graph.node_mask
        h = nn.Dropout(self.input_drop, deterministic=not training)(x)
        out_feat = None
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            heads = 1 if last else self.num_heads
            width = self.out_feats if last else self.hidden
            h = DGLGATConv(
                out_feats=width,
                num_heads=heads,
                attn_drop=self.attn_drop,
                edge_drop=self.edge_drop,
                use_attn_dst=self.use_attn_dst,
                use_symmetric_norm=self.use_symmetric_norm,
                residual=True,
                name=f"gat_{i}",
            )(graph, h, training=training)
            if not last:
                h = h.reshape(h.shape[0], -1)  # flatten heads
                h = MaskedBatchNorm(
                    use_running_average=not training,
                    axis_name=self.bn_axis_name,
                    name=f"bn_{i}",
                )(h, mask)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
                out_feat = h
        h = jnp.mean(h, axis=1)  # head mean (single head on final layer)
        h = ElementWiseLinear(
            self.out_feats, use_weight=False, use_bias=True, name="bias_last"
        )(h)
        return h, out_feat


class SIGN(nn.Module):
    """SIGN inception model over precomputed hop features
    (reference ``arxiv_dgl/sign.py:136-163``): one :class:`FeedForwardNet`
    per hop, concat -> PReLU -> dropout (= ``out_feat``) -> project FFN."""

    hidden: int
    out_feats: int
    num_hops: int  # R + 1
    ff_layers: int = 2
    dropout: float = 0.5
    input_drop: float = 0.0

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], *, training: bool = False):
        assert len(feats) == self.num_hops
        drop_in = nn.Dropout(self.input_drop, deterministic=not training)
        hidden = []
        for hop in range(self.num_hops):
            ff = FeedForwardNet(
                self.hidden, self.hidden, self.ff_layers, self.dropout,
                name=f"inception_{hop}",
            )
            hidden.append(ff(drop_in(feats[hop]), training=training))
        h = jnp.concatenate(hidden, axis=-1)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        h = jnp.where(h >= 0, h, alpha.astype(h.dtype) * h)
        out_feat = nn.Dropout(self.dropout, deterministic=not training)(h)
        out = FeedForwardNet(
            self.hidden, self.out_feats, self.ff_layers, self.dropout, name="project"
        )(out_feat, training=training)
        return out, out_feat


class RGCN(nn.Module):
    """Heterogeneous R-GCN (reference ``mag_pyg/gnn.py:70-138``): embedding
    tables for featureless node types, ``num_layers`` RGCNConv with
    ReLU+dropout between layers. Input features arrive pre-grouped into one
    matrix (see data/mag.py ``group_input``); embedding-table rows are
    injected here so they are trainable."""

    hidden: int
    out_feats: int
    num_layers: int
    num_node_types: int
    num_edge_types: int
    dropout: float = 0.5
    # (node_type_id, table_size) for featureless node types
    emb_sizes: Sequence[tuple] = ()
    in_feats: int = 128

    @nn.compact
    def __call__(
        self,
        graph: Graph,
        x,
        node_type: jnp.ndarray,
        local_node_idx: jnp.ndarray,
        *,
        typed_graph: Optional[Graph] = None,
        training: bool = False,
    ):
        # inject trainable embeddings for featureless node types
        # (reference mag_pyg/gnn.py:89-93,115-124)
        h = x
        for type_id, size in self.emb_sizes:
            emb = self.param(
                f"emb_{type_id}", xavier_uniform, (size, self.in_feats), jnp.float32
            )
            rows = jnp.take(emb, jnp.clip(local_node_idx, 0, size - 1), axis=0)
            h = jnp.where((node_type == type_id)[:, None], rows.astype(h.dtype), h)

        out_feat = None
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            width = self.out_feats if last else self.hidden
            h = RGCNConv(
                width,
                num_node_types=self.num_node_types,
                num_edge_types=self.num_edge_types,
                name=f"conv_{i}",
            )(graph, h, node_type, typed_graph=typed_graph)
            if not last:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
                out_feat = h
        return h, out_feat


class PPIGAT(nn.Module):
    """Parameterized PPI GAT with parallel skip linears
    (reference ``ppi_pyg/gnn.py:86-117``; TeacherNet/StudentNet are fixed
    configurations of this shape, ``ppi_pyg/gnn.py:24-83``)."""

    hidden: int
    out_feats: int
    num_layers: int
    heads: int = 4
    final_heads: Optional[int] = None  # defaults to `heads`, concat=False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        h = x
        out_feat = None
        for i in range(self.num_layers - 1):
            conv = PyGGATConv(self.hidden, num_heads=self.heads, name=f"conv_{i}")(
                graph, h, training=training
            )
            skip = nn.Dense(
                self.hidden * self.heads, kernel_init=xavier_uniform, name=f"lin_{i}"
            )(h)
            h = nn.elu(conv + skip)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
            out_feat = h
        fh = self.final_heads or self.heads
        conv = PyGGATConv(
            self.out_feats, num_heads=fh, concat=False, name=f"conv_{self.num_layers - 1}"
        )(graph, h, training=training)
        skip = nn.Dense(
            self.out_feats, kernel_init=xavier_uniform, name=f"lin_{self.num_layers - 1}"
        )(h)
        return conv + skip, out_feat


def ppi_teacher(num_classes: int) -> PPIGAT:
    """TeacherNet: 3L GAT, 4 heads x 256, final 6-head mean
    (``ppi_pyg/gnn.py:24-47``)."""
    return PPIGAT(hidden=256, out_feats=num_classes, num_layers=3, heads=4, final_heads=6)


def ppi_student(num_classes: int) -> PPIGAT:
    """StudentNet: 5L GAT, 2 heads x 68 (``ppi_pyg/gnn.py:50-83``)."""
    return PPIGAT(hidden=68, out_feats=num_classes, num_layers=5, heads=2, final_heads=2)


class ProjectionMLP(nn.Module):
    """Linear -> BN -> ReLU projection head for FitNet/GSP/G-CRD
    (reference ``arxiv_pyg/gnn.py:296-306``)."""

    proj_dim: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, training: bool = False, mask=None):
        h = nn.Dense(self.proj_dim, kernel_init=xavier_uniform)(x)
        h = MaskedBatchNorm(
            use_running_average=not training, axis_name=self.bn_axis_name
        )(h, mask)
        return nn.relu(h)


class ProjectionLinear(nn.Module):
    """Bare linear projection (CRD variant, ``arxiv_pyg/gnn.py:286-293``)."""

    proj_dim: int

    @nn.compact
    def __call__(self, x, *, training: bool = False, mask=None):
        return nn.Dense(self.proj_dim, kernel_init=xavier_uniform)(x)


class ProjectionGCD(nn.Module):
    """Graph-conditioned projection: ``Linear + GCNConv -> BN -> ReLU``
    (reference ``arxiv_pyg/gnn.py:88-99``; ``use_linear=False`` gives the
    KD-and-aux variant, ``gnn_kd_and_aux.py:87-97``)."""

    proj_dim: int
    use_linear: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        h = GCNConv(self.proj_dim, name="conv")(graph, x)
        if self.use_linear:
            h = h + nn.Dense(self.proj_dim, kernel_init=xavier_uniform, name="lin")(x)
        h = MaskedBatchNorm(
            use_running_average=not training, axis_name=self.bn_axis_name
        )(h, graph.node_mask)
        return nn.relu(h)
