"""ogbn-mag R-GCN trainer: GraphSAINT sampling + online teacher.

Port of the reference driver (``mag_pyg/gnn.py:174-483``): per epoch,
``num_steps`` GraphSAINT random-walk subgraphs are sampled on the host
(static padded shapes) and fed to ONE jitted step that runs the student
R-GCN, the frozen teacher R-GCN under ``stop_gradient`` (the reference's
``torch.no_grad()`` online-teacher forward, mag_pyg/gnn.py:199-247 —
required because sampled subgraphs change every step), the loss-mode
dispatch over train-masked nodes, and the optimizer update.

Projection usage matches MAG exactly: nce/fitnet project (teacher dim 512),
at/gpw/lpw use raw features (mag_pyg/gnn.py:404-421,222-247).

Evaluation is the full-graph inference path (``RGCN.inference``,
mag_pyg/gnn.py:140-171) — here simply the jitted full-graph forward, whose
per-relation mean + root-linear math is identical.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

import queue as _queue
import threading as _threading

from efficient_gnns_tpu.data.mag import MagDataset
from efficient_gnns_tpu.distill import criteria
from efficient_gnns_tpu.graphs.preprocess import build_graph
from efficient_gnns_tpu.models.gnns import RGCN, ProjectionMLP
from efficient_gnns_tpu.sampling.saint import GraphSaintRandomWalkSampler
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.node_trainer import TrainState, _split_vars


def _make_rgcn(ds: MagDataset, hidden: int, num_layers: int, dropout: float,
               feat_dim: int) -> RGCN:
    key2int = ds.grouped.key2int
    emb_sizes = tuple(
        (key2int[nt], ds.num_nodes_dict[nt])
        for nt in sorted(ds.num_nodes_dict)
        if nt != "paper"
    )
    return RGCN(
        hidden=hidden,
        out_feats=ds.num_classes,
        num_layers=num_layers,
        num_node_types=len(ds.num_nodes_dict),
        num_edge_types=ds.num_edge_types,
        dropout=dropout,
        emb_sizes=emb_sizes,
        in_feats=feat_dim,
    )


class _SamplePrefetcher:
    """Background-thread GraphSAINT sampling with early device upload.

    The reference hides its sampler cost behind the PyTorch DataLoader's
    worker processes (``mag_pyg/gnn.py:361-366``); here one daemon thread
    builds the next padded subgraphs and starts their host->device transfer
    while the current step runs — on tunneled TPU backends the per-sample
    upload, not the device math, is the step-time floor. Samples keep the
    sampler's deterministic RNG order (single worker)."""

    def __init__(self, sampler, depth: int = 2):
        self._sampler = sampler
        self._q = _queue.Queue(maxsize=depth)
        self._stop = _threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = _threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        try:
            while not self._stop.is_set():
                sub = self._sampler.sample()
                sub = sub._replace(
                    graph=jax.device_put(sub.graph),
                    typed_graph=None if sub.typed_graph is None
                    else jax.device_put(sub.typed_graph),
                    node_ids=jax.device_put(jnp.asarray(sub.node_ids)),
                )
                while not self._stop.is_set():
                    try:
                        self._q.put(sub, timeout=0.5)
                        break
                    except _queue.Full:
                        continue
        except BaseException as exc:  # surfaced from get(); thread would
            self._exc = exc          # otherwise die silently and get() hang
            self._stop.set()

    def get(self):
        while True:
            try:
                item = self._q.get(timeout=0.5)
                return item
            except _queue.Empty:
                if self._exc is not None:
                    raise RuntimeError(
                        "prefetch sampler thread failed"
                    ) from self._exc

    def close(self):
        """Stop the thread and wait for it to exit — after close() returns
        the sampler's RNG/buffers are safe to use from the calling thread
        (the cli.mag --time_steps path samples on the main thread)."""
        self._stop.set()
        # unblock a producer waiting on a full queue
        try:
            while True:
                self._q.get_nowait()
        except _queue.Empty:
            pass
        self._thread.join(timeout=10.0)


class MagTrainer:
    def __init__(
        self,
        config: DistillConfig,
        ds: MagDataset,
        batch_size: int = 20000,
        num_steps: int = 30,
        walk_length: Optional[int] = None,
        teacher_params: Optional[dict] = None,
        teacher_hidden: int = 512,
        teacher_layers: int = 3,
        seed: int = 0,
        edge_budget: Optional[int] = None,
        typed_square: bool = True,
        block: bool = True,
        prefetch: int = 2,
    ):
        """``typed_square``/``block`` (default on): sampled subgraphs carry
        the relation-typed square layout and Pallas edge blockings, so each
        R-GCN layer is ONE static-weight blocked SpMM instead of R
        relation-masked full-edge passes (models/layers.py RGCNConv typed
        path; reference semantics mag_pyg/gnn.py:54-65)."""
        cfg = config
        self.cfg = cfg
        self.ds = ds
        self.seed = seed
        self.num_steps = num_steps
        self.teacher_hidden = teacher_hidden
        g = ds.grouped
        feat_dim = ds.x_paper.shape[1]
        n_total = g.node_type.shape[0]

        # global node payloads
        paper_glob = g.local2global["paper"]
        x_global = np.zeros((n_total, feat_dim), np.float32)
        x_global[paper_glob] = ds.x_paper
        y_global = np.zeros(n_total, np.int32)
        y_global[paper_glob] = ds.y_paper
        train_mask = np.zeros(n_total, bool)
        train_mask[paper_glob[ds.split_idx["train"]]] = True

        self.x_global = jnp.asarray(x_global)
        self.y_global = jnp.asarray(y_global)
        self.train_mask_global = jnp.asarray(train_mask)
        self.node_type_global = jnp.asarray(g.node_type.astype(np.int32))
        self.local_idx_global = jnp.asarray(g.local_node_idx.astype(np.int32))

        self.sampler = GraphSaintRandomWalkSampler(
            g.edge_index[0], g.edge_index[1], n_total,
            batch_size=batch_size,
            walk_length=walk_length if walk_length is not None else cfg.num_layers,
            edge_type=g.edge_type,
            num_edge_types=ds.num_edge_types,
            seed=seed,
            edge_budget=edge_budget,
            typed_square=typed_square,
            block=block,
        )

        # full graph for inference
        self.full_graph = build_graph(
            g.edge_index[0], g.edge_index[1], n_total,
            edge_type=g.edge_type, num_edge_types=ds.num_edge_types,
        )
        # layer-wise chunked eval (reference RGCN.inference memory
        # discipline, mag_pyg/gnn.py:140-171): peak = one layer's
        # activations, not the unrolled full-graph forward
        from efficient_gnns_tpu.train.layerwise import RGCNLayerwiseInference

        self.layerwise = RGCNLayerwiseInference(
            g.edge_index[0], g.edge_index[1], g.edge_type,
            n_total, ds.num_edge_types,
            chunk_nodes=min(16384, max(256, (n_total // 8) // 256 * 256)),
        )

        self.model = _make_rgcn(ds, cfg.hidden, cfg.num_layers, cfg.dropout, feat_dim)
        self.teacher = None
        self.teacher_vars = None
        if cfg.needs_teacher():
            self.teacher = _make_rgcn(ds, teacher_hidden, teacher_layers, 0.5, feat_dim)
            if teacher_params is None:
                # fresh random teacher (tests / smoke runs)
                sub = self.sampler.sample()
                tv = self.teacher.init(
                    {"params": jax.random.PRNGKey(seed + 999)},
                    sub.graph,
                    self.x_global[jnp.asarray(sub.node_ids)],
                    self.node_type_global[jnp.asarray(sub.node_ids)],
                    self.local_idx_global[jnp.asarray(sub.node_ids)],
                    typed_graph=sub.typed_graph,
                )
                self.teacher_vars = {"params": tv["params"]}
            else:
                self.teacher_vars = {"params": teacher_params}

        self.sproj = self.tproj = None
        if cfg.training in ("nce", "fitnet"):
            self.sproj = ProjectionMLP(proj_dim=cfg.proj_dim)
            self.tproj = ProjectionMLP(proj_dim=cfg.proj_dim)

        self.tx = optax.adam(cfg.lr)
        self.state = self._init_state()
        self._train_step = jax.jit(self._make_train_step())
        self._eval_fwd = jax.jit(self._make_eval_fwd())
        self._prefetch_depth = int(prefetch)
        self._prefetcher: Optional[_SamplePrefetcher] = None

    # ------------------------------------------------------------------

    def _gather_payload(self, node_ids):
        ids = jnp.asarray(node_ids)
        return (
            self.x_global[ids],
            self.y_global[ids],
            self.train_mask_global[ids],
            self.node_type_global[ids],
            self.local_idx_global[ids],
        )

    def _init_state(self) -> TrainState:
        k = jax.random.PRNGKey(self.seed)
        k1, k2, k3 = jax.random.split(k, 3)
        sub = self.sampler.sample()
        x, y, tm, nt, li = self._gather_payload(sub.node_ids)
        variables = self.model.init(
            {"params": k1, "dropout": k1}, sub.graph, x, nt, li,
            typed_graph=sub.typed_graph,
        )
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}
        if self.sproj is not None:
            sv = self.sproj.init({"params": k2}, jnp.zeros((8, self.cfg.hidden)))
            tv = self.tproj.init({"params": k3}, jnp.zeros((8, self.teacher_hidden)))
            params["sproj"], batch_stats["sproj"] = _split_vars(sv)
            params["tproj"], batch_stats["tproj"] = _split_vars(tv)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    def _make_train_step(self):
        cfg = self.cfg

        def loss_fn(params, batch_stats, graph, typed_graph, node_ids, rng):
            k_drop, k_sample = jax.random.split(rng)
            x, y, train_mask, nt, li = self._gather_payload(node_ids)
            valid = graph.node_mask
            mask = train_mask & valid

            logits, feat = self.model.apply(
                {"params": params["model"]},
                graph, x, nt, li,
                typed_graph=typed_graph,
                training=True,
                rngs={"dropout": k_drop},
            )
            new_bs = dict(batch_stats)

            mode = cfg.training
            if mode == "supervised":
                loss = criteria.cls_ce(logits, y, mask)
                return loss, (loss, loss * 0.0, new_bs)

            t_logits, t_feat = jax.lax.stop_gradient(
                self.teacher.apply(self.teacher_vars, graph, x, nt, li,
                                   typed_graph=typed_graph, training=False)
            )
            if mode == "kd":
                loss, loss_cls, loss_aux = criteria.kd_criterion(
                    logits, y, t_logits, cfg.alpha, cfg.kd_T, mask
                )
                return loss, (loss_cls, loss_aux, new_bs)

            if mode in ("nce", "fitnet"):
                sf, smut = self.sproj.apply(
                    {"params": params["sproj"], "batch_stats": batch_stats["sproj"]},
                    feat, training=True, mask=mask, mutable=["batch_stats"],
                )
                tf, tmut = self.tproj.apply(
                    {"params": params["tproj"], "batch_stats": batch_stats["tproj"]},
                    t_feat, training=True, mask=mask, mutable=["batch_stats"],
                )
                new_bs["sproj"] = smut.get("batch_stats", batch_stats["sproj"])
                new_bs["tproj"] = tmut.get("batch_stats", batch_stats["tproj"])
            else:
                sf, tf = feat, t_feat

            if mode == "fitnet":
                loss_aux = criteria.fitnet_term(sf, tf, mask)
            elif mode == "at":
                loss_aux = criteria.at_term(sf, tf, mask)
            elif mode == "gpw":
                loss_aux = criteria.gsp_term(
                    sf, tf, cfg.kernel, key=k_sample,
                    max_samples=cfg.max_samples, mask=mask,
                )
            elif mode == "lpw":
                s, r = graph.senders, graph.receivers
                nn_ = graph.num_nodes
                keep = mask[jnp.minimum(s, nn_ - 1)] & mask[jnp.minimum(r, nn_ - 1)]
                loss_aux = criteria.lsp_term(
                    graph, sf, tf, cfg.kernel, keep_mask=keep
                )
            elif mode == "nce":
                loss_aux = criteria.nce_term(
                    sf, tf, cfg.nce_T, key=k_sample,
                    max_samples=cfg.max_samples, mask=mask,
                )
            else:
                raise NotImplementedError(mode)

            if cfg.kd_and_aux:
                kd_loss, loss_cls, _ = criteria.kd_criterion(
                    logits, y, t_logits, cfg.alpha, cfg.kd_T, mask
                )
                loss = kd_loss + cfg.beta * loss_aux
            else:
                loss_cls = criteria.cls_ce(logits, y, mask)
                loss = loss_cls + cfg.beta * loss_aux
            return loss, (loss_cls, loss_aux, new_bs)

        def step(state: TrainState, graph, typed_graph, node_ids, rng):
            (loss, (loss_cls, loss_aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, graph, typed_graph, node_ids,
              rng)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt),
                {"loss": loss, "loss_cls": loss_cls, "loss_aux": loss_aux},
            )

        return step

    def _make_eval_fwd(self):
        def fwd(params):
            logits, _ = self.model.apply(
                {"params": params["model"]},
                self.full_graph,
                self.x_global,
                self.node_type_global,
                self.local_idx_global,
                training=False,
            )
            return jnp.argmax(logits, -1)

        return fwd

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        if self._prefetcher is None and self._prefetch_depth > 0:
            self._prefetcher = _SamplePrefetcher(
                self.sampler, self._prefetch_depth
            )
        totals = {"loss": 0.0, "loss_cls": 0.0, "loss_aux": 0.0}
        for s in range(self.num_steps):
            sub = (self._prefetcher.get() if self._prefetcher is not None
                   else self.sampler.sample())
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), epoch * 1009 + s
            )
            self.state, m = self._train_step(
                self.state, sub.graph, sub.typed_graph,
                jnp.asarray(sub.node_ids), rng
            )
            for k in totals:
                totals[k] += float(m[k])
        return {k: v / self.num_steps for k, v in totals.items()}

    def close(self) -> None:
        """Stop the background sampling thread (idempotent)."""
        if self._prefetcher is not None:
            self._prefetcher.close()
            self._prefetcher = None

    def evaluate(self, layerwise: bool = True) -> Tuple[float, float, float]:
        """Full-graph accuracy per split. ``layerwise=True`` (default) uses
        the chunked per-layer inference path; ``False`` runs the single
        jitted full-graph forward (small graphs / parity checks)."""
        if layerwise:
            logits, _ = self.layerwise(
                {"params": self.state.params["model"]},
                self.x_global, self.node_type_global, self.local_idx_global,
                num_layers=self.cfg.num_layers,
                num_node_types=self.model.num_node_types,
                emb_sizes=self.model.emb_sizes,
            )
            pred = np.asarray(jnp.argmax(logits, -1))
        else:
            pred = np.asarray(self._eval_fwd(self.state.params))
        paper_glob = self.ds.grouped.local2global["paper"]
        y = np.asarray(self.ds.y_paper)
        out = []
        for k in ("train", "valid", "test"):
            ids = paper_glob[self.ds.split_idx[k]]
            out.append(float((pred[ids] == y[self.ds.split_idx[k]]).mean()))
        return tuple(out)

    def shard_embeddings(self, mesh, axis: str = "data") -> None:
        """Row-shard the featureless-node-type embedding tables (and their
        optimizer moments) over ``mesh``'s ``axis``; everything else is
        replicated. The ~1.2M x 128 tables are the dominant parameter mass
        at MAG scale (SURVEY.md section 7 hard parts; reference keeps them
        on one GPU, mag_pyg/gnn.py:387) — sharding them is what lets the
        teacher-width model scale past one chip's HBM."""
        from jax.sharding import NamedSharding, PartitionSpec

        def put(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "emb_" in name and getattr(leaf, "ndim", 0) == 2:
                spec = PartitionSpec(axis, None)
            else:
                spec = PartitionSpec()
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        self.state = jax.tree_util.tree_map_with_path(put, self.state)

    def num_params(self) -> int:
        return sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.state.params["model"])
        )
