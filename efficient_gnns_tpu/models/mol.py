"""Graph-classification models for ogbg-molhiv: GIN-E / PNA teachers and
GCN / GIN students.

The reference names these in its results table but never released the code
(``mol_pyg/README.md:9`` "Under preparation"; numbers in ``img/molhiv.png``),
so these follow the OGB-standard recipes the paper cites: GIN-E with
virtual-node option (Hu et al. OGB; Xu et al. GIN), PNA (Corso et al. 2020).

Molecule batches arrive as :class:`BatchedGraphs` (pad-and-mask packing) with
integer atom/bond feature matrices in graph edge order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficient_gnns_tpu.graphs.container import BatchedGraphs, Graph
from efficient_gnns_tpu.models.layers import MaskedBatchNorm, xavier_uniform
from efficient_gnns_tpu.ops import gather, segment_mean, segment_sum, spmm, spmm_mean
from efficient_gnns_tpu.ops.segment import segment_max, segment_min

# OGB molecular categorical feature vocabulary sizes
# (ogb.utils.features.get_atom_feature_dims / get_bond_feature_dims)
ATOM_FEATURE_DIMS = (119, 5, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)


class CategoricalEncoder(nn.Module):
    """Sum of per-column embeddings (OGB AtomEncoder/BondEncoder)."""

    dims: Sequence[int]
    features: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        out = jnp.zeros(feats.shape[:-1] + (self.features,), jnp.float32)
        for i, vocab in enumerate(self.dims):
            emb = nn.Embed(vocab, self.features, name=f"emb_{i}")
            out = out + emb(jnp.clip(feats[..., i], 0, vocab - 1))
        return out


def atom_encoder(features: int) -> CategoricalEncoder:
    return CategoricalEncoder(ATOM_FEATURE_DIMS, features)


def bond_encoder(features: int) -> CategoricalEncoder:
    return CategoricalEncoder(BOND_FEATURE_DIMS, features)


def global_mean_pool(batch: BatchedGraphs, x: jnp.ndarray) -> jnp.ndarray:
    """Mean of valid node features per graph -> [num_graphs, F]."""
    return segment_mean(
        jnp.where(batch.graph.node_mask[:, None], x, 0.0),
        batch.node_graph_ids,
        batch.num_graphs,
        indices_are_sorted=True,
    )


def global_sum_pool(batch: BatchedGraphs, x: jnp.ndarray) -> jnp.ndarray:
    return segment_sum(
        jnp.where(batch.graph.node_mask[:, None], x, 0.0),
        batch.node_graph_ids,
        batch.num_graphs,
        indices_are_sorted=True,
    )


class GINEConv(nn.Module):
    """GIN conv with edge features: ``MLP((1+eps)x + sum_j ReLU(x_j + e_ij))``."""

    features: int

    @nn.compact
    def __call__(self, graph: Graph, x, edge_emb, *, training: bool = False):
        eps = self.param("eps", nn.initializers.zeros, (), jnp.float32)
        msg = nn.relu(gather(x, graph.senders) + edge_emb)
        msg = jnp.where(graph.edge_mask[:, None], msg, 0.0)
        agg = segment_sum(
            msg, graph.receivers, graph.num_nodes, indices_are_sorted=True
        )
        h = (1.0 + eps) * x + agg
        h = nn.Dense(2 * self.features, kernel_init=xavier_uniform)(h)
        h = MaskedBatchNorm(use_running_average=not training)(h, graph.node_mask)
        h = nn.relu(h)
        h = nn.Dense(self.features, kernel_init=xavier_uniform)(h)
        return h


class GCNMolConv(nn.Module):
    """OGB mol-GCN conv: sym-norm aggregation of ``ReLU(x_j + e_ij)`` with a
    root term ``F.relu(x + root_emb) * 1/deg`` (ogb GCNConv for mol)."""

    features: int

    @nn.compact
    def __call__(self, graph: Graph, x, edge_emb, *, training: bool = False):
        h = nn.Dense(self.features, kernel_init=xavier_uniform)(x)
        root_emb = self.param("root_emb", nn.initializers.normal(1.0), (self.features,), jnp.float32)
        deg = graph.in_degrees() + 1.0
        dis = jax.lax.rsqrt(deg)
        norm = (
            dis[jnp.minimum(graph.senders, graph.num_nodes - 1)]
            * dis[jnp.minimum(graph.receivers, graph.num_nodes - 1)]
        )
        msg = nn.relu(gather(h, graph.senders) + edge_emb) * norm[:, None]
        msg = jnp.where(graph.edge_mask[:, None], msg, 0.0)
        agg = segment_sum(msg, graph.receivers, graph.num_nodes, indices_are_sorted=True)
        return agg + nn.relu(h + root_emb) * (1.0 / deg)[:, None]


class PNAConv(nn.Module):
    """Principal Neighbourhood Aggregation conv (Corso et al. 2020):
    degree-scaled multi-aggregator (mean/min/max/std) message passing with
    towers. ``delta`` is the dataset's mean log-degree normalizer."""

    features: int
    towers: int = 5
    delta: float = 1.0
    edge_features: bool = True

    @nn.compact
    def __call__(self, graph: Graph, x, edge_emb, *, training: bool = False):
        f, t = self.features, self.towers
        assert f % t == 0
        dt = f // t
        h = x.reshape(x.shape[0], t, dt)
        src = gather(h, graph.senders)
        dst = gather(h, graph.receivers)
        parts = [src, dst]
        if self.edge_features and edge_emb is not None:
            e = nn.Dense(f, kernel_init=xavier_uniform, name="edge_proj")(edge_emb)
            parts.append(e.reshape(-1, t, dt))
        msg_in = jnp.concatenate(parts, axis=-1)  # [E, t, k*dt]

        # per-tower pre-MLP: separate weights per tower via einsum
        w1 = self.param("pre_w", xavier_uniform, (t, msg_in.shape[-1], dt), jnp.float32)
        b1 = self.param("pre_b", nn.initializers.zeros, (t, dt), jnp.float32)
        msg = nn.relu(jnp.einsum("eti,tio->eto", msg_in, w1) + b1)
        msg = jnp.where(graph.edge_mask[:, None, None], msg, 0.0)

        n, ids = graph.num_nodes, graph.receivers
        raw_deg = graph.in_degrees()[:, None, None]
        deg = jnp.maximum(graph.in_degrees(), 1.0)
        s_mean = segment_mean(msg, ids, n)
        s_max = jnp.where(raw_deg > 0, segment_max(msg, ids, n), 0.0)
        s_min = jnp.where(raw_deg > 0, segment_min(msg, ids, n), 0.0)
        s_sq = segment_mean(msg * msg, ids, n)
        s_std = jnp.sqrt(nn.relu(s_sq - s_mean * s_mean) + 1e-5)
        aggs = jnp.concatenate([s_mean, s_max, s_min, s_std], axis=-1)  # [N,t,4dt]

        logd = jnp.log(deg + 1.0)[:, None, None]
        amp = logd / self.delta
        att = self.delta / jnp.maximum(logd, 1e-6)
        scaled = jnp.concatenate([aggs, aggs * amp, aggs * att], axis=-1)  # [N,t,12dt]

        combined = jnp.concatenate([h, scaled], axis=-1)  # [N, t, 13*dt]
        w2 = self.param("post_w", xavier_uniform, (t, combined.shape[-1], dt), jnp.float32)
        b2 = self.param("post_b", nn.initializers.zeros, (t, dt), jnp.float32)
        out = (jnp.einsum("nti,tio->nto", combined, w2) + b2).reshape(-1, f)
        return nn.Dense(f, kernel_init=xavier_uniform, name="mix")(out)


class MolGNN(nn.Module):
    """OGB-style mol GNN wrapper: atom/bond encoders, L conv layers with
    BN + ReLU + dropout and residual, optional virtual node, mean pooling,
    linear graph head. ``out_feat`` for distillation is the pooled graph
    embedding (graph-level G-CRD/KD per paper Table 2)."""

    conv: str  # 'gine' | 'gcn' | 'gin' | 'pna'
    hidden: int
    num_tasks: int
    num_layers: int = 5
    dropout: float = 0.5
    virtual_node: bool = False
    residual: bool = False
    pna_delta: float = 1.0
    pna_towers: int = 5

    def _make_conv(self, i: int):
        if self.conv in ("gine", "gin"):
            return GINEConv(self.hidden, name=f"conv_{i}")
        if self.conv == "gcn":
            return GCNMolConv(self.hidden, name=f"conv_{i}")
        if self.conv == "pna":
            return PNAConv(
                self.hidden, towers=self.pna_towers, delta=self.pna_delta,
                name=f"conv_{i}",
            )
        raise ValueError(self.conv)

    @nn.compact
    def __call__(
        self,
        batch: BatchedGraphs,
        atom_feats: jnp.ndarray,
        bond_feats: jnp.ndarray,
        *,
        training: bool = False,
    ):
        graph = batch.graph
        h = atom_encoder(self.hidden)(atom_feats)
        h = jnp.where(graph.node_mask[:, None], h, 0.0)

        if self.virtual_node:
            vn = self.param(
                "virtualnode_emb", nn.initializers.zeros, (self.hidden,), jnp.float32
            )
            vstate = jnp.tile(vn[None, :], (batch.num_graphs, 1))

        for i in range(self.num_layers):
            # per-layer bond encoder, matching the OGB GNN recipe
            be = CategoricalEncoder(
                BOND_FEATURE_DIMS, self.hidden, name=f"bond_encoder_{i}"
            )
            edge_emb = be(bond_feats)
            if self.virtual_node:
                h = h + gather(vstate, batch.node_graph_ids)
                h = jnp.where(graph.node_mask[:, None], h, 0.0)
            h_in = h
            h = self._make_conv(i)(graph, h, edge_emb, training=training)
            h = MaskedBatchNorm(use_running_average=not training, name=f"bn_{i}")(
                h, graph.node_mask
            )
            if i < self.num_layers - 1:
                h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
            if self.residual:
                h = h + h_in
            if self.virtual_node and i < self.num_layers - 1:
                pooled = global_sum_pool(batch, h_in) + vstate
                mlp = nn.Sequential([
                    nn.Dense(2 * self.hidden, kernel_init=xavier_uniform),
                    nn.relu,
                    nn.Dense(self.hidden, kernel_init=xavier_uniform),
                    nn.relu,
                ])
                vstate = nn.Dropout(self.dropout, deterministic=not training)(
                    mlp(pooled)
                )

        graph_feat = global_mean_pool(batch, h)
        out = nn.Dense(self.num_tasks, kernel_init=xavier_uniform, name="graph_pred")(
            graph_feat
        )
        return out, graph_feat
