"""PPI inductive trainer: per-graph steps, online teacher, BCE criteria.

Port of the reference driver (``ppi_pyg/gnn.py:185-437`` +
``train_teacher.py``): batch=1 graph per optimizer step over the 20 train
graphs, teacher forward under stop-gradient inside the same jitted step,
BCE-based criteria (ppi_pyg/criterion.py), micro-F1 evaluation over the
val/test graph sets. nce/fitnet use projection heads (teacher dim 1024 for
the real TeacherNet); at/gpw/lpw use raw features (ppi_pyg/gnn.py:229-250).

All graphs share one static padded shape (data/ppi.py), so the step
compiles once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficient_gnns_tpu.data.ppi import PPIDataset, PPIGraph, micro_f1
from efficient_gnns_tpu.distill import criteria
from efficient_gnns_tpu.models.gnns import PPIGAT, ProjectionMLP
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.node_trainer import TrainState, _split_vars


class PPITrainer:
    def __init__(
        self,
        config: DistillConfig,
        ds: PPIDataset,
        student: PPIGAT,
        teacher: Optional[PPIGAT] = None,
        teacher_params: Optional[dict] = None,
        teacher_feat_dim: int = 1024,
        seed: int = 0,
    ):
        cfg = config
        self.cfg = cfg
        self.ds = ds
        self.model = student
        self.teacher = teacher
        self.teacher_vars = None
        self.seed = seed

        if cfg.needs_teacher():
            assert teacher is not None
            g0 = ds.train[0]
            if teacher_params is None:
                tv = teacher.init(
                    {"params": jax.random.PRNGKey(seed + 4242)},
                    g0.graph, jnp.asarray(g0.x),
                )
                teacher_params = tv["params"]
            self.teacher_vars = {"params": teacher_params}

        self.sproj = self.tproj = None
        if cfg.training in ("nce", "fitnet"):
            self.sproj = ProjectionMLP(proj_dim=cfg.proj_dim)
            self.tproj = ProjectionMLP(proj_dim=cfg.proj_dim)
        self.teacher_feat_dim = teacher_feat_dim

        self.tx = optax.adam(cfg.lr)
        self.state = self._init_state()
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())

    # ------------------------------------------------------------------

    def _init_state(self) -> TrainState:
        k = jax.random.PRNGKey(self.seed)
        k1, k2, k3 = jax.random.split(k, 3)
        g0 = self.ds.train[0]
        variables = self.model.init(
            {"params": k1, "dropout": k1}, g0.graph, jnp.asarray(g0.x)
        )
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}
        if self.sproj is not None:
            _, feat = self.model.apply(variables, g0.graph, jnp.asarray(g0.x))
            sv = self.sproj.init({"params": k2}, feat)
            tv = self.tproj.init(
                {"params": k3}, jnp.zeros((8, self.teacher_feat_dim))
            )
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

        def loss_fn(params, batch_stats, graph, x, y, rng):
            k_drop, k_sample = jax.random.split(rng)
            mask = graph.node_mask
            logits, feat = self.model.apply(
                {"params": params["model"]},
                graph, x, training=True, rngs={"dropout": k_drop},
            )
            new_bs = dict(batch_stats)
            mode = cfg.training

            if mode == "supervised":
                loss = criteria.cls_bce(logits, y, mask)
                return loss, (loss, loss * 0.0, new_bs)

            t_logits, t_feat = jax.lax.stop_gradient(
                self.teacher.apply(self.teacher_vars, graph, x, training=False)
            )
            if mode == "kd":
                loss, loss_cls, loss_aux = criteria.kd_criterion_bce(
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
                loss_aux = criteria.lsp_term(graph, sf, tf, cfg.kernel)
            elif mode == "nce":
                loss_aux = criteria.nce_term(
                    sf, tf, cfg.nce_T, key=k_sample,
                    max_samples=cfg.max_samples, mask=mask,
                )
            else:
                raise NotImplementedError(mode)

            if cfg.kd_and_aux:
                kd_loss, loss_cls, _ = criteria.kd_criterion_bce(
                    logits, y, t_logits, cfg.alpha, cfg.kd_T, mask
                )
                loss = kd_loss + cfg.beta * loss_aux
            else:
                loss_cls = criteria.cls_bce(logits, y, mask)
                loss = loss_cls + cfg.beta * loss_aux
            return loss, (loss_cls, loss_aux, new_bs)

        def step(state: TrainState, graph, x, y, rng):
            (loss, (loss_cls, loss_aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, graph, x, y, rng)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt),
                {"loss": loss, "loss_cls": loss_cls, "loss_aux": loss_aux},
            )

        return step

    def _make_eval_step(self):
        def fwd(params, graph, x):
            logits, _ = self.model.apply(
                {"params": params["model"]}, graph, x, training=False
            )
            return logits

        return fwd

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        order = np.random.default_rng(self.seed * 7919 + epoch).permutation(
            len(self.ds.train)
        )
        totals = {"loss": 0.0, "loss_cls": 0.0, "loss_aux": 0.0}
        for i, gi in enumerate(order):
            g = self.ds.train[gi]
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), epoch * 211 + i
            )
            self.state, m = self._train_step(
                self.state, g.graph, jnp.asarray(g.x), jnp.asarray(g.y), rng
            )
            for k in totals:
                totals[k] += float(m[k])
        return {k: v / len(order) for k, v in totals.items()}

    def evaluate(self, graphs: List[PPIGraph]) -> float:
        """Micro-F1 over the concatenated valid nodes of a graph set."""
        logits_all, labels_all = [], []
        for g in graphs:
            lg = np.asarray(
                self._eval_step(self.state.params, g.graph, jnp.asarray(g.x))
            )
            logits_all.append(lg[: g.num_nodes])
            labels_all.append(g.y[: g.num_nodes])
        return micro_f1(np.concatenate(logits_all), np.concatenate(labels_all))

    def evaluate_all(self) -> Tuple[float, float, float]:
        return (
            self.evaluate(self.ds.train),
            self.evaluate(self.ds.valid),
            self.evaluate(self.ds.test),
        )
