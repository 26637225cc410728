"""ogbg-molhiv graph-classification distillation trainer.

The reference names this workload in its results (GIN-E / PNA teachers into
GCN / GIN students, paper Table 2 = ``img/molhiv.png``) but released no code
(``mol_pyg/README.md:9``), so this trainer follows the same driver pattern
as the released workloads: online teacher under stop-gradient, the shared
criterion set applied to *graph-level* representations (pooled embeddings),
BCE classification, ROC-AUC evaluation with best-validation selection.

Batches are fixed-shape packed molecule graphs (data/molhiv.py) — one
compiled step for the whole run.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficient_gnns_tpu.data.molhiv import MolBatcher, MolDataset, roc_auc
from efficient_gnns_tpu.distill import criteria
from efficient_gnns_tpu.models.mol import MolGNN
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.node_trainer import TrainState, _split_vars


class MolTrainer:
    def __init__(
        self,
        config: DistillConfig,
        ds: MolDataset,
        student: MolGNN,
        teacher: Optional[MolGNN] = None,
        teacher_params: Optional[dict] = None,
        batch_size: int = 32,
        max_atoms: int = 32,
        seed: int = 0,
    ):
        cfg = config
        self.cfg = cfg
        self.ds = ds
        self.model = student
        self.teacher = teacher
        self.seed = seed
        self.batcher = MolBatcher(ds.train, batch_size, max_atoms, shuffle=True)
        self.eval_batchers = {
            "train": MolBatcher(ds.train, batch_size, max_atoms, shuffle=False),
            "valid": MolBatcher(ds.valid, batch_size, max_atoms, shuffle=False),
            "test": MolBatcher(ds.test, batch_size, max_atoms, shuffle=False),
        }

        b0 = next(self.batcher.epoch(0))
        self._example = b0

        self.teacher_vars = None
        if cfg.needs_teacher():
            assert teacher is not None
            if teacher_params is None:
                batch, atoms, bonds, _ = b0
                tv = teacher.init(
                    {"params": jax.random.PRNGKey(seed + 77),
                     "dropout": jax.random.PRNGKey(seed + 78)},
                    batch, jnp.asarray(atoms), jnp.asarray(bonds),
                )
                self.teacher_vars = tv
            else:
                self.teacher_vars = teacher_params

        self.sproj = self.tproj = None
        if cfg.training in ("nce", "fitnet", "gpw"):
            from efficient_gnns_tpu.models.gnns import ProjectionMLP

            self.sproj = ProjectionMLP(proj_dim=cfg.proj_dim)
            self.tproj = ProjectionMLP(proj_dim=cfg.proj_dim)

        self.tx = optax.adam(cfg.lr)
        self.state = self._init_state()
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())

    # ------------------------------------------------------------------

    def _init_state(self) -> TrainState:
        k = jax.random.PRNGKey(self.seed)
        k1, k2, k3 = jax.random.split(k, 3)
        batch, atoms, bonds, _ = self._example
        variables = self.model.init(
            {"params": k1, "dropout": k1}, batch, jnp.asarray(atoms),
            jnp.asarray(bonds),
        )
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}
        if self.sproj is not None:
            sv = self.sproj.init({"params": k2}, jnp.zeros((8, self.model.hidden)))
            tv = self.tproj.init({"params": k3}, jnp.zeros((8, self.teacher.hidden)))
            params["sproj"], batch_stats["sproj"] = _split_vars(sv)
            params["tproj"], batch_stats["tproj"] = _split_vars(tv)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )

    def _apply_model(self, model, variables, batch, atoms, bonds, training, rng):
        if training:
            (out, gfeat), mut = model.apply(
                variables, batch, atoms, bonds, training=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return out, gfeat, mut.get("batch_stats", {})
        out, gfeat = model.apply(variables, batch, atoms, bonds, training=False)
        return out, gfeat, None

    def _make_train_step(self):
        cfg = self.cfg

        def loss_fn(params, batch_stats, batch, atoms, bonds, labels, rng):
            k_drop, k_sample = jax.random.split(rng)
            gmask = batch.graph_mask
            out, gfeat, mbs = self._apply_model(
                self.model,
                {"params": params["model"], "batch_stats": batch_stats["model"]},
                batch, atoms, bonds, True, k_drop,
            )
            new_bs = dict(batch_stats)
            new_bs["model"] = mbs
            logits = out[:, 0]
            mode = cfg.training

            if mode == "supervised":
                loss = criteria.cls_bce(logits, labels, gmask)
                return loss, (loss, loss * 0.0, new_bs)

            t_out, t_gfeat, _ = self._apply_model(
                self.teacher, self.teacher_vars, batch, atoms, bonds, False, None
            )
            t_out = jax.lax.stop_gradient(t_out)
            t_gfeat = jax.lax.stop_gradient(t_gfeat)
            t_logits = t_out[:, 0]

            if mode == "kd":
                loss, loss_cls, loss_aux = criteria.kd_criterion_bce(
                    logits, labels, t_logits, cfg.alpha, cfg.kd_T, gmask
                )
                return loss, (loss_cls, loss_aux, new_bs)

            if mode in ("nce", "fitnet", "gpw"):
                sf, smut = self.sproj.apply(
                    {"params": params["sproj"], "batch_stats": batch_stats["sproj"]},
                    gfeat, training=True, mask=gmask, mutable=["batch_stats"],
                )
                tf, tmut = self.tproj.apply(
                    {"params": params["tproj"], "batch_stats": batch_stats["tproj"]},
                    t_gfeat, training=True, mask=gmask, mutable=["batch_stats"],
                )
                new_bs["sproj"] = smut.get("batch_stats", batch_stats["sproj"])
                new_bs["tproj"] = tmut.get("batch_stats", batch_stats["tproj"])
            else:
                sf, tf = gfeat, t_gfeat

            if mode == "fitnet":
                loss_aux = criteria.fitnet_term(sf, tf, gmask)
            elif mode == "at":
                loss_aux = criteria.at_term(sf, tf, gmask)
            elif mode == "gpw":
                loss_aux = criteria.gsp_term(
                    sf, tf, cfg.kernel, key=k_sample,
                    max_samples=cfg.max_samples, mask=gmask,
                )
            elif mode == "nce":
                loss_aux = criteria.nce_term(
                    sf, tf, cfg.nce_T, key=k_sample,
                    max_samples=cfg.max_samples, mask=gmask,
                )
            else:
                raise NotImplementedError(
                    f"mode {mode} undefined for graph classification"
                )

            if cfg.kd_and_aux:
                kd_loss, loss_cls, _ = criteria.kd_criterion_bce(
                    logits, labels, t_logits, cfg.alpha, cfg.kd_T, gmask
                )
                loss = kd_loss + cfg.beta * loss_aux
            else:
                loss_cls = criteria.cls_bce(logits, labels, gmask)
                loss = loss_cls + cfg.beta * loss_aux
            return loss, (loss_cls, loss_aux, new_bs)

        def step(state, batch, atoms, bonds, labels, rng):
            (loss, (loss_cls, loss_aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, atoms, bonds, labels, rng)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt),
                {"loss": loss, "loss_cls": loss_cls, "loss_aux": loss_aux},
            )

        return step

    def _make_eval_step(self):
        def fwd(params, batch_stats, batch, atoms, bonds):
            out, _ = self.model.apply(
                {"params": params["model"], "batch_stats": batch_stats["model"]},
                batch, atoms, bonds, training=False,
            )
            return out[:, 0]

        return fwd

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        totals = {"loss": 0.0, "loss_cls": 0.0, "loss_aux": 0.0}
        n = 0
        for batch, atoms, bonds, labels in self.batcher.epoch(
            self.seed * 613 + epoch
        ):
            rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch * 389 + n)
            self.state, m = self._train_step(
                self.state, batch, jnp.asarray(atoms), jnp.asarray(bonds),
                jnp.asarray(labels), rng,
            )
            for k in totals:
                totals[k] += float(m[k])
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def evaluate(self, split: str) -> float:
        scores, labels = [], []
        for batch, atoms, bonds, lb in self.eval_batchers[split].epoch(0):
            s = np.asarray(
                self._eval_step(self.state.params, self.state.batch_stats,
                                batch, jnp.asarray(atoms), jnp.asarray(bonds))
            )
            m = np.asarray(batch.graph_mask)
            scores.append(s[m])
            labels.append(lb[m])
        return roc_auc(np.concatenate(scores), np.concatenate(labels))

    def evaluate_all(self) -> Tuple[float, float, float]:
        return tuple(self.evaluate(k) for k in ("train", "valid", "test"))
