"""Full-graph node-classification distillation trainer.

TPU-native re-design of the reference student trainers
(``arxiv_pyg/gnn.py:102-383`` and ``gnn_kd_and_aux.py:100-368``): the whole
epoch body — student forward, projection heads, loss dispatch, backward,
optimizer update — is ONE jitted function over static graph structure. The
12-way Python loss dispatch happens at trace time (the mode string is
static), so each mode compiles to a single fused XLA program.

Teacher coupling is offline (dump/replay): per-seed teacher features/logits
are device-resident arrays, exactly like the reference's ``torch.load`` of
GAT dumps (``arxiv_pyg/gnn.py:276-279``). The online-teacher path lives in
the sampled-subgraph trainers.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from efficient_gnns_tpu.distill import criteria
from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.models.gnns import ProjectionGCD, ProjectionMLP
from efficient_gnns_tpu.train.config import DistillConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # {"model":..., optional "sproj"/"tproj":...}
    batch_stats: Any
    opt_state: Any


def _split_vars(variables) -> Tuple[Any, Any]:
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    return params, bs


class NodeDistillTrainer:
    """Owns the jitted train/eval steps for one (model, mode) combination."""

    def __init__(
        self,
        model,
        config: DistillConfig,
        graph: Graph,
        x: jnp.ndarray,
        y: jnp.ndarray,
        split_idx: Dict[str, np.ndarray],
        teacher_feat: Optional[jnp.ndarray] = None,
        teacher_logits: Optional[jnp.ndarray] = None,
        lsp_graph: Optional[Graph] = None,
        seed: int = 0,
    ):
        self.model = model
        self.cfg = config
        self.graph = graph
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.split_idx = {k: jnp.asarray(v) for k, v in split_idx.items()}
        self.teacher_feat = teacher_feat
        self.teacher_logits = teacher_logits
        self.lsp_graph = lsp_graph
        self.seed = seed

        if config.needs_teacher():
            assert teacher_logits is not None, "mode requires teacher logits"
        if config.training not in ("supervised", "kd"):
            assert teacher_feat is not None, "mode requires teacher features"
        if config.training == "lpw" or config.training.endswith("edges"):
            assert lsp_graph is not None, "mode requires the train subgraph"

        self.sproj = self.tproj = None
        if config.needs_mlp_proj():
            self.sproj = ProjectionMLP(proj_dim=config.proj_dim)
            self.tproj = ProjectionMLP(proj_dim=config.proj_dim)
        elif config.needs_gcd_proj():
            # KD+aux GCD variant drops the parallel linear (gnn_kd_and_aux.py:87-97)
            self.sproj = ProjectionGCD(
                proj_dim=config.proj_dim, use_linear=not config.kd_and_aux
            )
            self.tproj = ProjectionGCD(
                proj_dim=config.proj_dim, use_linear=not config.kd_and_aux
            )

        self.tx = optax.adam(config.lr) if config.weight_decay == 0 else optax.adamw(
            config.lr, weight_decay=config.weight_decay
        )
        self.state = self._init_state()
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())
        self._epoch_chunk = jax.jit(self._make_epoch_chunk(), static_argnums=(3,))

    # ------------------------------------------------------------------

    def _init_state(self) -> TrainState:
        k = jax.random.PRNGKey(self.seed)
        k_model, k_sp, k_tp, _ = jax.random.split(k, 4)
        variables = self.model.init(
            {"params": k_model, "dropout": k_model}, self.graph, self.x
        )
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}

        if self.sproj is not None:
            tr = self.split_idx["train"]
            _, feat = self.model.apply(variables, self.graph, self.x)
            if self.cfg.needs_gcd_proj():
                sv = self.sproj.init({"params": k_sp}, self.graph, feat)
                tv = self.tproj.init(
                    {"params": k_tp}, self.graph, self.teacher_feat
                )
            else:
                sv = self.sproj.init({"params": k_sp}, feat[tr])
                tv = self.tproj.init({"params": k_tp}, self.teacher_feat[tr])
            params["sproj"], batch_stats["sproj"] = _split_vars(sv)
            params["tproj"], batch_stats["tproj"] = _split_vars(tv)

        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    # ------------------------------------------------------------------

    def _apply_proj(self, proj, params, bs, args, training):
        out, mut = proj.apply(
            {"params": params, "batch_stats": bs},
            *args,
            training=training,
            mutable=["batch_stats"] if training else [],
        )
        return out, (mut.get("batch_stats", bs) if training else bs)

    def _batch(self):
        """The large device arrays as ONE jit-argument pytree — baking the
        graph (hub slices, blockings) and teacher arrays in as closure
        constants blows the remote-compile request limit on tunneled TPU
        backends (same rule as bench.py)."""
        return (self.graph, self.x, self.teacher_feat, self.teacher_logits,
                self.lsp_graph)

    def _make_train_step(self) -> Callable:
        cfg = self.cfg
        y = self.y
        tr = self.split_idx["train"]

        def loss_fn(params, batch_stats, rng, batch):
            graph, x, t_feat, t_logits, lsp_graph = batch
            k_drop, k_sample = jax.random.split(rng)
            (logits, feat), mut = self.model.apply(
                {"params": params["model"], "batch_stats": batch_stats["model"]},
                graph,
                x,
                training=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            new_bs = dict(batch_stats)
            new_bs["model"] = mut.get("batch_stats", batch_stats["model"])

            out = logits[tr]
            labels = y[tr]
            mode = cfg.training

            def mlp_projected():
                sf, new_bs["sproj"] = self._apply_proj(
                    self.sproj, params["sproj"], batch_stats["sproj"], (feat[tr],), True
                )
                tf, new_bs["tproj"] = self._apply_proj(
                    self.tproj, params["tproj"], batch_stats["tproj"], (t_feat[tr],), True
                )
                return sf, tf

            def gcd_projected():
                sf, new_bs["sproj"] = self._apply_proj(
                    self.sproj, params["sproj"], batch_stats["sproj"], (graph, feat), True
                )
                tf, new_bs["tproj"] = self._apply_proj(
                    self.tproj, params["tproj"], batch_stats["tproj"], (graph, t_feat), True
                )
                return sf[tr], tf[tr]

            if mode == "supervised":
                loss = criteria.cls_ce(out, labels)
                loss_cls, loss_aux = loss, loss * 0
            elif mode == "kd":
                loss, loss_cls, loss_aux = criteria.kd_criterion(
                    out, labels, t_logits[tr], cfg.alpha, cfg.kd_T,
                    reduction=cfg.kd_reduction,
                )
            else:
                # representation-distillation modes
                if mode == "fitnet":
                    sf, tf = mlp_projected()
                    loss_aux = criteria.fitnet_term(sf, tf)
                elif mode == "at":
                    loss_aux = criteria.at_term(feat[tr], t_feat[tr])
                elif mode == "gpw":
                    sf, tf = mlp_projected()
                    loss_aux = criteria.gsp_term(
                        sf, tf, cfg.kernel, key=k_sample, max_samples=cfg.max_samples
                    )
                elif mode == "lpw":
                    loss_aux = criteria.lsp_term(
                        lsp_graph, feat[tr], t_feat[tr], cfg.kernel
                    )
                elif mode == "nce":
                    sf, tf = mlp_projected()
                    loss_aux = criteria.nce_term(
                        sf, tf, cfg.nce_T, key=k_sample, max_samples=cfg.max_samples
                    )
                elif mode in ("nce-labels", "nce-edges", "nce-labels-edges"):
                    # working extensions of the reference's unreleased modes
                    # (arxiv_pyg/gnn.py:149-177 — NameError in the reference)
                    sf, tf = mlp_projected()
                    loss_aux = criteria.nce_term_structured(
                        sf, tf, cfg.nce_T, key=k_sample,
                        max_samples=cfg.max_samples,
                        labels=labels if "labels" in mode else None,
                        graph=lsp_graph if "edges" in mode else None,
                    )
                elif mode == "gcd":
                    sf, tf = gcd_projected()
                    loss_aux = criteria.nce_term(
                        sf, tf, cfg.nce_T, key=k_sample, max_samples=cfg.max_samples
                    )
                else:
                    raise NotImplementedError(mode)

                if cfg.kd_and_aux:
                    # loss = KD total + beta * aux (gnn_kd_and_aux.py:118-181)
                    kd_loss, loss_cls, _ = criteria.kd_criterion(
                        out, labels, t_logits[tr], cfg.alpha, cfg.kd_T,
                        reduction=cfg.kd_reduction,
                    )
                    loss = kd_loss + cfg.beta * loss_aux
                else:
                    loss_cls = criteria.cls_ce(out, labels)
                    loss = loss_cls + cfg.beta * loss_aux

            return loss, (loss_cls, loss_aux, new_bs)

        def train_step(state: TrainState, rng, batch):
            (loss, (loss_cls, loss_aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, rng, batch)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_bs,
                    opt_state=new_opt,
                ),
                {"loss": loss, "loss_cls": loss_cls, "loss_aux": loss_aux},
            )

        return train_step

    def _make_eval_step(self) -> Callable:
        y = self.y
        idx = self.split_idx

        def eval_step(params, batch_stats, batch):
            graph, x = batch[0], batch[1]
            logits, _ = self.model.apply(
                {"params": params["model"], "batch_stats": batch_stats["model"]},
                graph,
                x,
                training=False,
            )
            pred = jnp.argmax(logits, axis=-1)
            accs = tuple(
                jnp.mean((pred[idx[k]] == y[idx[k]]).astype(jnp.float32))
                for k in ("train", "valid", "test")
            )
            return logits, accs

        return eval_step

    def _make_epoch_chunk(self) -> Callable:
        """K epochs (train + eval) as one on-device ``lax.scan`` — one host
        round trip per chunk instead of per epoch (tunnel latency dominates
        sub-second steps on remote TPU backends). Per-epoch eval statistics
        come back stacked; best-epoch selection stays host-side (Logger
        argmax-val semantics, reference ``arxiv_pyg/logger.py:14-22``)."""
        train_step = self._make_train_step()
        eval_step = self._make_eval_step()
        base_rng = jax.random.PRNGKey(self.seed)

        def chunk(state, start_epoch, batch, k: int):
            def body(state, epoch):
                rng = jax.random.fold_in(base_rng, epoch)
                state, m = train_step(state, rng, batch)
                _, accs = eval_step(state.params, state.batch_stats, batch)
                hist = jnp.stack([
                    m["loss"], m["loss_cls"], m["loss_aux"],
                    accs[0], accs[1], accs[2],
                ])
                return state, hist

            return jax.lax.scan(
                body, state, start_epoch + jnp.arange(k, dtype=jnp.int32)
            )

        return chunk

    def run_epochs(self, start_epoch: int, k: int) -> np.ndarray:
        """Run ``k`` epochs on device; returns float32[k, 6] per-epoch
        (loss, loss_cls, loss_aux, acc_train, acc_valid, acc_test)."""
        self.state, hist = self._epoch_chunk(
            self.state, jnp.int32(start_epoch), self._batch(), k
        )
        return np.asarray(hist)

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        self.state, metrics = self._train_step(self.state, rng, self._batch())
        return {k: float(v) for k, v in metrics.items()}

    def evaluate(self) -> Tuple[jnp.ndarray, Tuple[float, float, float]]:
        logits, accs = self._eval_step(
            self.state.params, self.state.batch_stats, self._batch()
        )
        return logits, tuple(float(a) for a in accs)

    # ------------------------------------------------------------------
    # checkpoint / resume (the reference only ever saves —
    # arxiv_pyg/gnn.py:371-381; resume is a deliberate improvement)

    def save_checkpoint(self, path: str) -> str:
        from efficient_gnns_tpu.train.checkpoint import save_pytree

        return save_pytree(path, self.state)

    def restore_checkpoint(self, path: str) -> int:
        """Restore full training state (params, BN stats, optimizer, step).
        Returns the restored step count (epochs already trained)."""
        from efficient_gnns_tpu.train.checkpoint import load_pytree

        self.state = load_pytree(path, self.state)
        return int(self.state.step)
