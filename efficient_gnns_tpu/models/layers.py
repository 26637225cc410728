"""Graph convolution layers (flax.linen) built on the sparse op floor.

Each layer reproduces the *semantics* of a reference building block (DGL /
PyG convolutions — citations inline) re-expressed as dense MXU matmuls plus
the framework's sorted-segment SpMM/SDDMM/edge-softmax primitives.

Conventions:
* every layer takes ``(graph, x)`` with ``x: float[num_nodes, F]``;
* graphs are receiver-sorted padded COO (graphs/container.py) — when a layer
  needs self loops or normalized weights, the *graph builder* supplies them
  (static preprocessing keeps the jitted step free of adjacency work);
* dropout uses linen's ``deterministic`` flag; BatchNorm uses
  ``use_running_average`` and supports padded-node masking plus a mesh axis
  for cross-replica statistics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.ops import (
    edge_softmax,
    gather,
    sddmm_add,
    spmm,
    spmm_heads,
    spmm_mean,
)
from efficient_gnns_tpu.ops.attention import (
    gat_attention,
    sample_edge_masks,
    supports_fused_attention,
)
from efficient_gnns_tpu.ops.hub_attention import (
    hub_gat_attention,
    supports_hub_attention,
)

xavier_uniform = nn.initializers.xavier_uniform()
xavier_normal = nn.initializers.xavier_normal()
# torch's nn.init.calculate_gain("relu") == sqrt(2); the reference applies it
# to GAT/SIGN xavier inits (arxiv_dgl/models.py:138-149, sign.py:122-126).
relu_gain_xavier_normal = nn.initializers.variance_scaling(
    2.0, "fan_avg", "truncated_normal"
)
relu_gain_xavier_uniform = nn.initializers.variance_scaling(
    2.0, "fan_avg", "uniform"
)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the node axis with padding masking.

    The reference uses ``nn.BatchNorm1d`` everywhere; on TPU, padded node
    rows must not contaminate batch statistics, and under data parallelism
    statistics are reduced over the mesh axis (``axis_name``) — the
    cross-replica BN noted as a hard part in SURVEY.md section 7.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # sum/sum-of-squares formulation so cross-replica reduction is a
            # single psum of three scalars/vectors
            xf = x.astype(jnp.float32)
            if mask is not None:
                m = mask.astype(jnp.float32)[:, None]
                count = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=0)
                s2 = jnp.sum(xf * xf * m, axis=0)
            else:
                count = jnp.float32(x.shape[0])
                s1 = jnp.sum(xf, axis=0)
                s2 = jnp.sum(xf * xf, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class GCNConv(nn.Module):
    """PyG ``GCNConv`` semantics: ``out = A_hat (X W) + b`` with the
    symmetric normalization precomputed into ``graph.edge_weight``
    (``gcn_norm_weights``; reference ``arxiv_pyg/gnn.py:28-35`` uses
    ``cached=True`` — here the cache is the static graph itself)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x):
        x = nn.Dense(self.features, use_bias=False, kernel_init=xavier_uniform)(x)
        out = spmm(graph, x)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(out.dtype)
        return out


class SAGEConv(nn.Module):
    """PyG ``SAGEConv`` (mean aggregator): ``W_l mean_{j->i}(x_j) + W_r x_i``
    (reference ``arxiv_pyg/gnn.py:56-85``)."""

    features: int

    @nn.compact
    def __call__(self, graph: Graph, x):
        agg = spmm_mean(graph, x)
        out = nn.Dense(self.features, use_bias=True, kernel_init=xavier_uniform)(agg)
        out = out + nn.Dense(
            self.features, use_bias=False, kernel_init=xavier_uniform
        )(x)
        return out


class DGLGATConv(nn.Module):
    """The reference's custom DGL GAT convolution
    (``arxiv_dgl/models.py:95-236``) with all its teacher-grade extras:

    * separate ``attn_l``/``attn_r`` score vectors, ``use_attn_dst`` switch
      (``--no-attn-dst`` drops the destination term, models.py:199-204);
    * symmetric-norm pre/post scaling — ``deg_out^-0.5`` on source features,
      ``deg_in^+0.5`` on the aggregated output (models.py:179-184, 220-225);
    * edge-drop that removes a random edge subset *before* softmax
      normalization (models.py:207-214) via ``keep_mask`` edge-softmax;
    * residual through a no-bias linear (models.py:228-230).
    """

    out_feats: int
    num_heads: int = 1
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    edge_drop: float = 0.0
    negative_slope: float = 0.2
    use_attn_dst: bool = True
    residual: bool = False
    use_symmetric_norm: bool = False
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        h, d = self.num_heads, self.out_feats
        x = nn.Dropout(self.feat_drop, deterministic=not training)(x)
        feat = nn.Dense(h * d, use_bias=False, kernel_init=relu_gain_xavier_normal)(x)
        feat = feat.reshape(-1, h, d)

        feat_src = feat
        if self.use_symmetric_norm:
            degs = jnp.maximum(graph.out_degrees(), 1.0)
            feat_src = feat_src * jax.lax.rsqrt(degs)[:, None, None].astype(feat.dtype)

        attn_l = self.param("attn_l", relu_gain_xavier_normal, (d, h), jnp.float32)
        el = jnp.einsum("nhd,dh->nh", feat_src.astype(jnp.float32), attn_l)
        er = None
        if self.use_attn_dst:
            attn_r = self.param("attn_r", relu_gain_xavier_normal, (d, h), jnp.float32)
            er = jnp.einsum("nhd,dh->nh", feat.astype(jnp.float32), attn_r)

        if (er is None and self.attn_drop == 0.0
                and supports_hub_attention(graph)):
            # sender-only logits: softmax aggregation collapses to two
            # static-structure SpMMs over the hub-dense decomposition
            # (ops/hub_attention.py) — the flagship teacher fast path
            # (--no-attn-dst, arxiv_dgl/models.py:199-204)
            drop_seed = None
            if training and self.edge_drop > 0:
                drop_seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                )
            rst = hub_gat_attention(
                graph, feat_src, el,
                negative_slope=self.negative_slope,
                edge_drop=self.edge_drop, drop_seed=drop_seed,
            )
        elif supports_fused_attention(graph):
            # fused blocked path: SDDMM -> edge-softmax -> weighted SpMM as
            # Pallas kernels in blocked edge order (ops/attention.py)
            keep = attn = None
            if training and (self.edge_drop > 0 or self.attn_drop > 0):
                keep, attn = sample_edge_masks(
                    graph, self.make_rng("dropout"),
                    self.edge_drop, self.attn_drop, h,
                )
            rst = gat_attention(
                graph, feat_src, el, er,
                negative_slope=self.negative_slope,
                keep_mask=keep, attn_keep=attn,
                attn_keep_prob=1.0 - self.attn_drop,
            )
        else:
            if er is not None:
                e = sddmm_add(graph, el, er)  # [E, H]
            else:
                e = gather(el, graph.senders)
            e = nn.leaky_relu(e, self.negative_slope)

            keep_mask = None
            if training and self.edge_drop > 0:
                # The reference permutes edge ids and keeps a (1-edge_drop)
                # fraction; a per-edge Bernoulli keep is the static-shape
                # analog with the same marginal distribution.
                rng = self.make_rng("dropout")
                keep_mask = jax.random.bernoulli(
                    rng, 1.0 - self.edge_drop, (graph.num_edges_padded,)
                )
            a = edge_softmax(graph, e, keep_mask=keep_mask)
            a = nn.Dropout(self.attn_drop, deterministic=not training)(a)

            rst = spmm_heads(graph, feat_src, a.astype(feat_src.dtype))  # [N, H, D]

        if self.use_symmetric_norm:
            degs = jnp.maximum(graph.in_degrees(), 1.0)
            rst = rst * jnp.sqrt(degs)[:, None, None].astype(rst.dtype)

        if self.residual:
            res = nn.Dense(h * d, use_bias=False, kernel_init=relu_gain_xavier_normal)(x)
            rst = rst + res.reshape(-1, h, d)

        if self.activation is not None:
            rst = self.activation(rst)
        return rst  # [N, H, D]


class PyGGATConv(nn.Module):
    """PyG ``GATConv`` semantics (used by the PPI models,
    ``ppi_pyg/gnn.py:24-117``): LeakyReLU attention with per-head source /
    destination score vectors, head concat (or mean when ``concat=False``)
    and an output bias. PyG adds self loops inside the conv; here the PPI
    graph builder adds them once (data/ppi.py)."""

    out_feats: int
    num_heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        h, d = self.num_heads, self.out_feats
        feat = nn.Dense(h * d, use_bias=False, kernel_init=xavier_uniform)(x)
        feat = feat.reshape(-1, h, d)
        att_src = self.param("att_src", xavier_uniform, (d, h), jnp.float32)
        att_dst = self.param("att_dst", xavier_uniform, (d, h), jnp.float32)
        el = jnp.einsum("nhd,dh->nh", feat.astype(jnp.float32), att_src)
        er = jnp.einsum("nhd,dh->nh", feat.astype(jnp.float32), att_dst)
        if supports_fused_attention(graph):
            attn = None
            if training and self.dropout > 0:
                _, attn = sample_edge_masks(
                    graph, self.make_rng("dropout"), 0.0, self.dropout, h
                )
            rst = gat_attention(
                graph, feat, el, er,
                negative_slope=self.negative_slope,
                attn_keep=attn, attn_keep_prob=1.0 - self.dropout,
            )
        else:
            e = nn.leaky_relu(sddmm_add(graph, el, er), self.negative_slope)
            a = edge_softmax(graph, e)
            a = nn.Dropout(self.dropout, deterministic=not training)(a)
            rst = spmm_heads(graph, feat, a.astype(feat.dtype))
        if self.concat:
            rst = rst.reshape(-1, h * d)
            bias = self.param("bias", nn.initializers.zeros, (h * d,), jnp.float32)
        else:
            rst = jnp.mean(rst, axis=1)
            bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return rst + bias.astype(rst.dtype)


class RGCNConv(nn.Module):
    """Relational conv (``mag_pyg/gnn.py:26-71``): per-relation *mean*
    aggregation through no-bias linears plus per-node-type root linears.

    Two execution paths, identical math (``mean(W_r x_j) == W_r mean(x_j)``
    by linearity; both produce the same ``rel_lin_r`` parameters):

    * ``typed_graph`` (TPU fast path): ONE static-weight blocked SpMM over
      the relation-typed square layout — senders live at row
      ``type * n_pad + s`` of the stacked per-relation projections
      ``[W_0 x; ...; W_{R-1} x]`` and the per-relation mean rides the
      pre-blocked static weights ``1/deg_type[receiver]``
      (sampling/saint.py builds this layout per subgraph). Edge
      enumeration cost is E, not R*E.
    * fallback: R relation-masked SpMMs over the shared typed edge list
      (full-edge work per relation — used for full-graph inference where
      the stacked table would not fit HBM).
    """

    features: int
    num_node_types: int
    num_edge_types: int

    @nn.compact
    def __call__(self, graph: Graph, x, node_type: jnp.ndarray,
                 typed_graph: Optional[Graph] = None):
        if typed_graph is not None:
            xw = jnp.concatenate(
                [
                    nn.Dense(
                        self.features, use_bias=False,
                        kernel_init=xavier_uniform, name=f"rel_lin_{r}",
                    )(x)
                    for r in range(self.num_edge_types)
                ],
                axis=0,
            )  # [R * n_pad, F] — row layout matches typed_graph senders
            out = spmm(typed_graph, xw)[: x.shape[0]]
        else:
            if graph.edge_type is None:
                raise ValueError("RGCNConv requires graph.edge_type")
            out = jnp.zeros((x.shape[0], self.features), dtype=x.dtype)
            for r in range(self.num_edge_types):
                sel = (graph.edge_type == r).astype(x.dtype)
                # per-relation in-degree for the mean; masks carry no gradient
                deg = spmm(graph, jnp.ones((x.shape[0], 1), x.dtype),
                           edge_weight=sel, weight_grad=False)
                agg = spmm(graph, x, edge_weight=sel, weight_grad=False) / jnp.maximum(deg, 1.0)
                out = out + nn.Dense(
                    self.features, use_bias=False, kernel_init=xavier_uniform,
                    name=f"rel_lin_{r}",
                )(agg)
        for t in range(self.num_node_types):
            root = nn.Dense(
                self.features, use_bias=True, kernel_init=xavier_uniform,
                name=f"root_lin_{t}",
            )(x)
            out = out + jnp.where((node_type == t)[:, None], root, 0.0)
        return out


class ElementWiseLinear(nn.Module):
    """Per-feature affine (``arxiv_dgl/models.py:11-43``) — the GAT
    teacher's final bias layer uses weight=False, bias=True."""

    features: int
    use_weight: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_weight:
            w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
            x = x * w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            x = x + b.astype(x.dtype)
        return x


class FeedForwardNet(nn.Module):
    """SIGN's MLP block (``arxiv_dgl/sign.py:105-134``): Linear stack with
    PReLU + dropout between layers, xavier-uniform(relu gain) init."""

    hidden: int
    out_feats: int
    n_layers: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        dims = (
            [self.out_feats]
            if self.n_layers == 1
            else [self.hidden] * (self.n_layers - 1) + [self.out_feats]
        )
        # the reference shares one PReLU across layers (sign.py:118)
        if self.n_layers > 1:
            alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        for i, f in enumerate(dims):
            x = nn.Dense(f, kernel_init=relu_gain_xavier_uniform, name=f"lin_{i}")(x)
            if i < len(dims) - 1:
                x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x
