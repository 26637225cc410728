"""GraphSAINT random-walk subgraph sampler.

Replaces PyG's C++ ``GraphSAINTRandomWalkSampler`` (torch-cluster
``random_walk`` + ``sample_adj``; reference ``mag_pyg/gnn.py:361-366``):
sample ``batch_size`` root nodes uniformly, walk ``walk_length`` steps over
the (out-)adjacency, take the node-induced subgraph of all visited nodes
and relabel.

TPU-first twist: subgraphs are padded to *static* shapes (node budget =
``batch_size * (walk_length + 1)``, configurable edge budget) so one
compiled train step serves every sampled subgraph — the recompile-budget
control called out in SURVEY.md section 7. The walk itself is vectorized
NumPy over CSR (a C++ builder can slot in behind the same interface).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.graphs.preprocess import build_graph


class SaintSubgraph(NamedTuple):
    graph: Graph  # padded, receiver-sorted; edge_type attached when typed
    node_ids: np.ndarray  # int64 [node_budget] global ids (0 for padding)
    num_nodes: int  # valid node count
    dropped_edges: int  # edges over budget (0 in practice)
    # relation-typed square layout for the single-pass R-GCN SpMM
    # (models/layers.py RGCNConv typed path): senders live at row
    # ``edge_type * node_budget + s`` and static edge weights carry the
    # per-relation mean normalization 1/deg_type[receiver].
    typed_graph: Optional[Graph] = None


class GraphSaintRandomWalkSampler:
    def __init__(
        self,
        senders: np.ndarray,
        receivers: np.ndarray,
        num_nodes: int,
        batch_size: int,
        walk_length: int,
        edge_budget: Optional[int] = None,
        edge_type: Optional[np.ndarray] = None,
        num_edge_types: int = 0,
        seed: int = 0,
        block: bool = False,
        typed_square: bool = False,
    ):
        """``block=True`` builds the Pallas edge blockings for every sampled
        subgraph (static budgets keep the compiled step stable);
        ``typed_square=True`` additionally builds the relation-typed square
        graph for the single-pass R-GCN SpMM (requires ``edge_type``)."""
        self.num_nodes = int(num_nodes)
        self.batch_size = int(batch_size)
        self.walk_length = int(walk_length)
        self.node_budget = self.batch_size * (self.walk_length + 1)
        self.edge_type = None if edge_type is None else np.asarray(edge_type)
        self.num_edge_types = num_edge_types
        self.block = bool(block)
        self.typed_square = bool(typed_square)
        if self.typed_square and self.edge_type is None:
            raise ValueError("typed_square requires edge_type")
        self.block_tm, self.block_eb = 256, 512
        self.rng = np.random.default_rng(seed)

        # CSR over senders (out-adjacency) for the walk
        order = np.argsort(senders, kind="stable")
        self._nbr = np.asarray(receivers)[order]
        counts = np.bincount(np.asarray(senders), minlength=num_nodes)
        self._offsets = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=self._offsets[1:])
        self._deg = counts.astype(np.int64)

        # receiver-CSR for fast induced-subgraph extraction
        r = np.asarray(receivers)
        order_r = np.argsort(r, kind="stable")
        self._in_src = np.asarray(senders)[order_r]
        self._in_eid = order_r
        counts_r = np.bincount(r, minlength=num_nodes)
        self._in_offsets = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(counts_r, out=self._in_offsets[1:])

        self._senders = np.asarray(senders)
        self._receivers = np.asarray(receivers)
        if edge_budget is None:
            # heuristic: avg degree * node budget * 2, rounded up
            avg_deg = max(1.0, len(senders) / max(num_nodes, 1))
            edge_budget = int(avg_deg * self.node_budget * 2)
        self.edge_budget = ((edge_budget + 1023) // 1024) * 1024

    def _random_walk(self) -> np.ndarray:
        """Batched random walk; dead ends stay in place.

        Uses the C++ multi-threaded walker (native/gnns_host.cc
        ``random_walks``) when built, vectorized NumPy otherwise.
        """
        from efficient_gnns_tpu.native import host as _native

        roots = self.rng.integers(0, self.num_nodes, size=self.batch_size)
        if _native.available():
            walks = _native.random_walks(
                self._offsets.astype(np.int32),
                self._nbr.astype(np.int32),
                roots.astype(np.int32),
                self.walk_length,
                seed=int(self.rng.integers(0, 2**63 - 1)),
            )
            return np.unique(walks)
        cur = roots
        visited = [cur]
        for _ in range(self.walk_length):
            deg = self._deg[cur]
            r = self.rng.integers(0, np.maximum(deg, 1))
            nxt = np.where(
                deg > 0, self._nbr[self._offsets[cur] + np.minimum(r, deg - 1)], cur
            )
            visited.append(nxt)
            cur = nxt
        return np.unique(np.concatenate(visited))

    def sample(self) -> SaintSubgraph:
        nodes = self._random_walk()
        k = len(nodes)
        # induced edges: all in-edges of sampled nodes whose sender is sampled
        starts, ends = self._in_offsets[nodes], self._in_offsets[nodes + 1]
        lens = ends - starts
        total = int(lens.sum())
        # vectorized range-gather: position j within each node's in-edge span
        cand_dst = np.repeat(nodes, lens)
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
            + np.repeat(starts, lens)
        )
        cand_eid = self._in_eid[pos]
        cand_src = self._senders[cand_eid]
        relabel = np.full(self.num_nodes, -1, dtype=np.int64)
        relabel[nodes] = np.arange(k, dtype=np.int64)
        keep = relabel[cand_src] >= 0
        eid = cand_eid[keep]
        s_loc = relabel[cand_src[keep]]
        r_loc = relabel[cand_dst[keep]]

        dropped = 0
        if len(eid) > self.edge_budget:
            dropped = len(eid) - self.edge_budget
            sel = self.rng.choice(len(eid), self.edge_budget, replace=False)
            eid, s_loc, r_loc = eid[sel], s_loc[sel], r_loc[sel]

        et = None
        if self.edge_type is not None:
            et = self.edge_type[eid]
        # static block budgets: every sampled subgraph must produce the SAME
        # array shapes or the jitted train step retraces per sample
        from efficient_gnns_tpu.graphs.blocking import max_blocks

        nb, nr = self.node_budget, self.num_edge_types
        e_blocks = -(-self.edge_budget // self.block_eb)
        # in typed mode the main graph's blocking is never used (the R-GCN
        # rides the typed layout; remaining consumers — LSP, masks — read
        # the COO arrays), so skip building + uploading it: per-sample
        # host->device bytes are the step-time floor on tunneled backends
        block_main = self.block and not self.typed_square
        blk_kwargs = {}
        if block_main:
            blk_kwargs = dict(
                block_tm=self.block_tm, block_eb=self.block_eb,
                block_pad_to=max_blocks(
                    nb, self.edge_budget, self.block_tm, self.block_eb
                ),
            )
        graph = build_graph(
            s_loc,
            r_loc,
            num_nodes=k,
            edge_type=et,
            num_edge_types=self.num_edge_types,
            pad_nodes_to=self.node_budget,
            pad_edges_to=self.edge_budget,
            n_node_valid=k,
            block=block_main,
            hub_dense=0,
            **blk_kwargs,
        )
        typed_graph = None
        if self.typed_square:
            # per-(relation, receiver) in-degree -> mean normalization as
            # STATIC edge weights (pre-blocked at build; reference semantics
            # mag_pyg/gnn.py:54-65 per-relation scatter-mean)
            cell = et.astype(np.int64) * nb + r_loc
            deg = np.bincount(cell, minlength=nr * nb)
            w = 1.0 / np.maximum(deg[cell], 1)
            tk = {}
            if self.block:
                # receivers < node_budget: tiles beyond get no blocks
                # (max_dst_row), so the tall R*N layout costs the same
                # block arrays as the square one; the transpose blocking
                # (receivers = typed senders, full range) keeps its own pad
                tk = dict(
                    block_tm=self.block_tm, block_eb=self.block_eb,
                    block_max_dst=nb,
                    block_pad_to=-(-nb // self.block_tm) + e_blocks,
                    t_block_pad_to=max_blocks(
                        nr * nb, self.edge_budget,
                        self.block_tm, self.block_eb,
                    ),
                )
            typed_graph = build_graph(
                s_loc + et.astype(np.int64) * nb,
                r_loc,
                num_nodes=nr * nb,
                edge_weight=w,
                pad_edges_to=self.edge_budget,
                n_node_valid=k,
                block=self.block,
                hub_dense=0,
                **tk,
            )
        node_ids = np.zeros(self.node_budget, dtype=np.int64)
        node_ids[:k] = nodes
        return SaintSubgraph(graph=graph, node_ids=node_ids, num_nodes=k,
                             dropped_edges=dropped, typed_graph=typed_graph)
