"""SIGN minibatch distillation trainer.

Port of the reference SIGN driver (``arxiv_dgl/sign.py:221-511``): after hop
precompute there are no graph ops left — training is dense MLP minibatching
over node IDs (the natural data-parallel path; the batch axis shards over a
``data`` mesh axis with a gradient psum inserted by XLA).

One jitted step covers every batch: batches have static size with a validity
mask (sampling/minibatch.py), and the loss-mode dispatch happens at trace
time. Supports both the plain-aux composition (``sign.py:221-290`` train)
and KD+aux (``sign.py:293-382`` train_kd_and_aux; note ``run()`` hard-calls
the latter, sign.py:460-465).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficient_gnns_tpu.distill import criteria
from efficient_gnns_tpu.models.gnns import SIGN, ProjectionMLP
from efficient_gnns_tpu.sampling.minibatch import NodeBatcher
from efficient_gnns_tpu.train.config import DistillConfig
from efficient_gnns_tpu.train.node_trainer import TrainState, _split_vars


class SIGNTrainer:
    def __init__(
        self,
        config: DistillConfig,
        feats: Sequence[jnp.ndarray],  # [R+1] x [N, F] hop features
        y: jnp.ndarray,
        split_idx: Dict[str, np.ndarray],
        num_classes: int,
        batch_size: int = 50_000,
        eval_batch_size: int = 100_000,
        teacher_feat: Optional[jnp.ndarray] = None,
        teacher_logits: Optional[jnp.ndarray] = None,
        ff_layers: int = 2,
        input_drop: float = 0.0,
        seed: int = 0,
    ):
        cfg = config
        self.cfg = cfg
        self.feats = [jnp.asarray(f) for f in feats]
        self.y = jnp.asarray(y)
        self.num_classes = num_classes
        self.teacher_feat = teacher_feat
        self.teacher_logits = teacher_logits
        self.seed = seed
        self.split_idx = split_idx
        self.num_nodes = self.feats[0].shape[0]

        if cfg.training in ("lpw", "gcd"):
            raise NotImplementedError(
                "graph-dependent modes are undefined for the graph-agnostic "
                "SIGN path (matches the reference's mode set, sign.py:310-369)"
            )
        if cfg.needs_teacher():
            assert teacher_logits is not None
        if cfg.training in ("fitnet", "at", "gpw", "nce"):
            assert teacher_feat is not None

        self.model = SIGN(
            hidden=cfg.hidden,
            out_feats=num_classes,
            num_hops=len(self.feats),
            ff_layers=ff_layers,
            dropout=cfg.dropout,
            input_drop=input_drop,
        )
        self.sproj = self.tproj = None
        if cfg.training in ("fitnet", "gpw", "nce"):
            self.sproj = ProjectionMLP(proj_dim=cfg.proj_dim)
            self.tproj = ProjectionMLP(proj_dim=cfg.proj_dim)

        # torch Adam weight_decay semantics: L2 added to the gradient
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
            optax.scale(-cfg.lr),
        )
        self.batcher = NodeBatcher(split_idx["train"], batch_size, shuffle=True)
        self.eval_batcher = NodeBatcher(
            np.arange(self.num_nodes), eval_batch_size, shuffle=False
        )
        self.state = self._init_state()
        self._data = (tuple(self.feats), self.y, self.teacher_feat,
                      self.teacher_logits)
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())

    # ------------------------------------------------------------------

    def _init_state(self) -> TrainState:
        k = jax.random.PRNGKey(self.seed)
        k1, k2, k3 = jax.random.split(k, 3)
        batch_feats = [f[:8] for f in self.feats]
        variables = self.model.init({"params": k1, "dropout": k1}, batch_feats)
        params = {"model": variables["params"]}
        batch_stats = {"model": variables.get("batch_stats", {})}
        if self.sproj is not None:
            _, feat = self.model.apply(variables, batch_feats)
            sv = self.sproj.init({"params": k2}, feat)
            tv = self.tproj.init({"params": k3}, self.teacher_feat[:8])
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

        def loss_fn(params, batch_stats, data, ids, mask, rng):
            feats, y, teacher_feat, teacher_logits = data
            k_drop, k_sample = jax.random.split(rng)
            batch_feats = [f[ids] for f in feats]
            labels = y[ids]
            (logits, feat), mut = self.model.apply(
                {"params": params["model"], "batch_stats": batch_stats["model"]},
                batch_feats,
                training=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            new_bs = dict(batch_stats)
            new_bs["model"] = mut.get("batch_stats", batch_stats["model"])

            mode = cfg.training
            if mode == "supervised":
                loss = criteria.cls_ce(logits, labels, mask)
                return loss, (loss, loss * 0, new_bs)
            t_logits = teacher_logits[ids]
            if mode == "kd":
                loss, loss_cls, loss_aux = criteria.kd_criterion(
                    logits, labels, t_logits, cfg.alpha, cfg.kd_T, mask
                )
                return loss, (loss_cls, loss_aux, new_bs)

            # representation modes
            if mode == "at":
                sf, tf = feat, teacher_feat[ids]
            else:
                sf, smut = self.sproj.apply(
                    {"params": params["sproj"], "batch_stats": batch_stats["sproj"]},
                    feat, training=True, mask=mask, mutable=["batch_stats"],
                )
                tf, tmut = self.tproj.apply(
                    {"params": params["tproj"], "batch_stats": batch_stats["tproj"]},
                    teacher_feat[ids], training=True, mask=mask,
                    mutable=["batch_stats"],
                )
                new_bs["sproj"] = smut.get("batch_stats", batch_stats["sproj"])
                new_bs["tproj"] = tmut.get("batch_stats", batch_stats["tproj"])

            if mode == "fitnet":
                loss_aux = criteria.fitnet_term(sf, tf, mask)
            elif mode == "at":
                loss_aux = criteria.at_term(sf, tf, mask)
            elif mode == "gpw":
                loss_aux = criteria.gsp_term(
                    sf, tf, cfg.kernel, key=k_sample,
                    max_samples=cfg.max_samples, mask=mask,
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
                    logits, labels, t_logits, cfg.alpha, cfg.kd_T, mask
                )
                loss = kd_loss + cfg.beta * loss_aux
            else:
                loss_cls = criteria.cls_ce(logits, labels, mask)
                loss = loss_cls + cfg.beta * loss_aux
            return loss, (loss_cls, loss_aux, new_bs)

        def step(state: TrainState, data, ids, mask, rng):
            # ``data`` = (hop feats, labels, teacher arrays) rides as a jit
            # ARGUMENT — closing over these ~0.5 GB arrays bakes them into
            # the XLA program (HTTP 413 on tunneled remote compile)
            (loss, (loss_cls, loss_aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, data, ids, mask, rng)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1, params=new_params,
                    batch_stats=new_bs, opt_state=new_opt,
                ),
                {"loss": loss, "loss_cls": loss_cls, "loss_aux": loss_aux},
            )

        return step

    def _make_eval_step(self):
        def step(params, batch_stats, feats, ids):
            batch_feats = [f[ids] for f in feats]
            logits, _ = self.model.apply(
                {"params": params["model"], "batch_stats": batch_stats["model"]},
                batch_feats,
                training=False,
            )
            return jnp.argmax(logits, -1)

        return step

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        totals = {"loss": 0.0, "loss_cls": 0.0, "loss_aux": 0.0}
        n = 0
        for ids, mask in self.batcher.epoch(seed=self.seed * 100003 + epoch):
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), epoch * 131 + n
            )
            self.state, m = self._train_step(
                self.state, self._data, jnp.asarray(ids), jnp.asarray(mask),
                rng
            )
            for k in totals:
                totals[k] += float(m[k])
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def evaluate(self) -> Tuple[float, float, float]:
        preds = []
        for ids, mask in self.eval_batcher.epoch(seed=0):
            p = self._eval_step(self.state.params, self.state.batch_stats,
                                tuple(self.feats), jnp.asarray(ids))
            preds.append(np.asarray(p)[mask])
        pred = np.concatenate(preds)
        y = np.asarray(self.y)
        return tuple(
            float((pred[self.split_idx[k]] == y[self.split_idx[k]]).mean())
            for k in ("train", "valid", "test")
        )

    def num_params(self) -> int:
        return sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.state.params["model"])
        )
