"""GAT teacher trainer — produces the arxiv students' inputs.

Port of the reference teacher driver semantics (``arxiv_dgl/gat.py``):

* **label reuse** (``--use-labels``): one-hot train labels concatenated to the
  features, with a random ``mask_rate`` split each epoch — labels of
  ``train_labels`` nodes are fed as input, the loss is computed on the
  complementary ``train_pred`` nodes (gat.py:104-131). Here the split is a
  static-shape boolean mask over all nodes.
* **label iterations** (``--n-label-iters``): re-inject ``softmax(pred)`` as
  the label channels of all non-label-fed nodes and re-forward
  (gat.py:136-141); unrolled at trace time.
* **log-eps loss**: ``mean(log(eps + CE) - log(eps))`` with
  ``eps = 1 - ln 2`` (gat.py:21,98-101).
* **RMSprop** with linear LR warm-up over the first 50 epochs
  (gat.py:110-113,189).
* **best-validation-LOSS selection** (gat.py:224-229) and per-seed artifact
  dumps: softmax output, raw logits, penultimate features, checkpoint
  (gat.py:243-258) in the framework's ``.npz`` format.

The entire train epoch (mask split + 1+k forwards + backward + update) is a
single jitted function.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from efficient_gnns_tpu.graphs.container import Graph
from efficient_gnns_tpu.models.gnns import GATTeacher

EPSILON = 1.0 - math.log(2.0)


def log_eps_loss(logits, labels, mask):
    """``mean(log(eps + CE) - log(eps))`` over masked rows (gat.py:98-101)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    y = jnp.log(EPSILON + ce) - math.log(EPSILON)
    m = mask.astype(jnp.float32)
    return jnp.sum(y * m) / jnp.maximum(jnp.sum(m), 1.0)


class TeacherState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: object


@struct.dataclass
class TeacherConfig:
    n_hidden: int = 250
    n_layers: int = 3
    n_heads: int = 3
    dropout: float = 0.75
    input_drop: float = 0.25
    attn_drop: float = 0.0
    edge_drop: float = 0.3
    use_labels: bool = True
    n_label_iters: int = 1
    mask_rate: float = 0.5
    no_attn_dst: bool = True
    use_norm: bool = True
    lr: float = 0.002
    wd: float = 0.0
    n_epochs: int = 2000


class GATTeacherTrainer:
    def __init__(
        self,
        config: TeacherConfig,
        graph: Graph,
        x: jnp.ndarray,
        y: jnp.ndarray,
        split_idx: Dict[str, np.ndarray],
        num_classes: int,
        seed: int = 0,
    ):
        cfg = config
        self.cfg = cfg
        self.graph = graph
        self.x = jnp.asarray(x)
        self.y = jnp.asarray(y)
        self.num_classes = num_classes
        self.seed = seed
        n = graph.num_nodes

        def mask_of(idx):
            m = np.zeros(n, bool)
            m[np.asarray(idx)] = True
            return jnp.asarray(m)

        self.train_mask = mask_of(split_idx["train"])
        self.valid_mask = mask_of(split_idx["valid"])
        self.test_mask = mask_of(split_idx["test"])
        self.split_idx = split_idx

        self.model = GATTeacher(
            hidden=cfg.n_hidden,
            out_feats=num_classes,
            num_layers=cfg.n_layers,
            num_heads=cfg.n_heads,
            dropout=cfg.dropout,
            input_drop=cfg.input_drop,
            attn_drop=cfg.attn_drop,
            edge_drop=cfg.edge_drop,
            use_attn_dst=not cfg.no_attn_dst,
            use_symmetric_norm=cfg.use_norm,
        )

        # linear warm-up over the first 50 epochs (one step per epoch)
        sched = lambda step: cfg.lr * jnp.minimum((step + 1.0) / 50.0, 1.0)
        # torch RMSprop: square-avg decay alpha=0.99, eps=1e-8
        self.tx = optax.chain(
            optax.scale_by_rms(decay=0.99, eps=1e-8),
            optax.add_decayed_weights(cfg.wd) if cfg.wd else optax.identity(),
            optax.scale_by_schedule(lambda s: -sched(s)),
        )
        self.state = self._init_state()
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())
        self._epoch_chunk = jax.jit(self._make_epoch_chunk(), static_argnums=(4,))
        self._dump_step = jax.jit(self._make_dump_step(), static_argnums=(4,))

    # ------------------------------------------------------------------

    @staticmethod
    def _with_labels(x, label_chan):
        """Concatenate label channels to node features (gat.py:104-107)."""
        return jnp.concatenate([x, label_chan], axis=-1)

    def _init_state(self) -> TeacherState:
        k = jax.random.PRNGKey(self.seed)
        feat = (
            self._with_labels(
                self.x, jnp.zeros((self.graph.num_nodes, self.num_classes))
            )
            if self.cfg.use_labels
            else self.x
        )
        variables = self.model.init(
            {"params": k, "dropout": k}, self.graph, feat
        )
        params = variables["params"]
        return TeacherState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
        )

    def _forward(self, params, batch_stats, graph, feat, training, rng):
        kwargs = dict(mutable=["batch_stats"]) if training else {}
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            graph,
            feat,
            training=training,
            rngs={"dropout": rng} if training else None,
            **kwargs,
        )
        if training:
            (logits, f), mut = out
            return logits, f, mut.get("batch_stats", batch_stats)
        logits, f = out
        return logits, f, batch_stats

    def _make_train_step(self):
        cfg = self.cfg
        onehot = jax.nn.one_hot(self.y, self.num_classes)

        # the graph and features ride as jit *arguments*: baking the hub
        # slices / blockings in as closure constants blows the remote-compile
        # request limit on tunneled backends (same rule as bench.py)
        def step(state: TeacherState, rng, graph, x):
            k_mask, k_drop = jax.random.split(rng)
            coin = jax.random.uniform(k_mask, (graph.num_nodes,)) < cfg.mask_rate
            if cfg.use_labels:
                label_fed = self.train_mask & coin  # labels fed as input
                pred_mask = self.train_mask & ~coin  # loss computed here
            else:
                label_fed = jnp.zeros_like(self.train_mask)
                pred_mask = self.train_mask & coin

            def loss_fn(params):
                drop_keys = jax.random.split(k_drop, 1 + cfg.n_label_iters)
                if cfg.use_labels:
                    chan = jnp.where(label_fed[:, None], onehot, 0.0)
                    feat = self._with_labels(x, chan)
                else:
                    feat = x
                logits, _, bs = self._forward(
                    params, state.batch_stats, graph, feat, True, drop_keys[0]
                )
                for i in range(cfg.n_label_iters):
                    # re-inject softmax predictions at non-label-fed nodes
                    soft = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=-1)
                    chan = jnp.where(label_fed[:, None], onehot, soft)
                    feat = self._with_labels(x, chan)
                    logits, _, bs = self._forward(
                        params, bs, graph, feat, True, drop_keys[1 + i]
                    )
                return log_eps_loss(logits, self.y, pred_mask), (logits, bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            pred = jnp.argmax(logits, -1)
            train_acc = jnp.sum(
                (pred == self.y) & self.train_mask
            ) / jnp.maximum(jnp.sum(self.train_mask), 1)
            return (
                TeacherState(state.step + 1, new_params, new_bs, new_opt),
                {"loss": loss, "train_acc": train_acc},
            )

        return step

    def _make_eval_step(self):
        cfg = self.cfg
        onehot = jax.nn.one_hot(self.y, self.num_classes)

        def step(params, batch_stats, graph, x):
            if cfg.use_labels:
                chan = jnp.where(self.train_mask[:, None], onehot, 0.0)
                feat = self._with_labels(x, chan)
            else:
                feat = x
            logits, feats, _ = self._forward(
                params, batch_stats, graph, feat, False, None
            )
            for _ in range(cfg.n_label_iters):
                soft = jax.nn.softmax(logits, axis=-1)
                chan = jnp.where(self.train_mask[:, None], onehot, soft)
                logits, feats, _ = self._forward(
                    params, batch_stats, graph, self._with_labels(x, chan),
                    False, None,
                )

            pred = jnp.argmax(logits, -1)

            def acc_and_loss(mask):
                acc = jnp.sum((pred == self.y) & mask) / jnp.maximum(jnp.sum(mask), 1)
                return acc, log_eps_loss(logits, self.y, mask)

            tr = acc_and_loss(self.train_mask)
            va = acc_and_loss(self.valid_mask)
            te = acc_and_loss(self.test_mask)
            return logits, feats, (tr[0], va[0], te[0]), (tr[1], va[1], te[1])

        return step

    def _make_dump_step(self):
        """Teacher-artifact forward with a selectable label-reuse channel.

        ``label_mode``:

        * ``"train"`` — reference dump semantics (``arxiv_dgl/gat.py:243-258``
          capture the ``evaluate()`` forward): true train labels fed as input
          channels. On tasks with planted label noise this leaks the noisy
          labels into the dumped logits, which KD then re-distills.
        * ``"self"`` — the label channel starts zeroed and each label
          iteration re-injects ``softmax(pred)`` at ALL nodes, so the dump is
          the teacher's own prediction function with no ground-truth-label
          input anywhere. This is the de-noised dump used for distillation on
          the hardened synthetic tasks (see RESULTS.md).
        """
        cfg = self.cfg
        onehot = jax.nn.one_hot(self.y, self.num_classes)

        def step(params, batch_stats, graph, x, label_mode: str = "train"):
            if cfg.use_labels:
                if label_mode == "train":
                    chan = jnp.where(self.train_mask[:, None], onehot, 0.0)
                else:
                    chan = jnp.zeros_like(onehot)
                feat = self._with_labels(x, chan)
            else:
                feat = x
            logits, feats, _ = self._forward(
                params, batch_stats, graph, feat, False, None
            )
            if cfg.use_labels:
                for _ in range(cfg.n_label_iters):
                    soft = jax.nn.softmax(logits, axis=-1)
                    if label_mode == "train":
                        chan = jnp.where(self.train_mask[:, None], onehot, soft)
                    else:
                        chan = soft
                    logits, feats, _ = self._forward(
                        params, batch_stats, graph, self._with_labels(x, chan),
                        False, None,
                    )
            return logits, feats

        return step

    def dump_outputs(self, best, label_mode: str = "train"):
        """(logits, feats) of the best-validation params under ``label_mode``."""
        return self._dump_step(
            best["params"], best["batch_stats"], self.graph, self.x, label_mode
        )

    def _make_epoch_chunk(self):
        """K epochs (train + full eval + best-val-LOSS tracking, reference
        ``arxiv_dgl/gat.py:224-229``) as ONE on-device ``lax.scan``.

        Per-epoch host reads cost a tunnel round trip each on remote TPU
        backends (~5 s/epoch measured vs 0.5 s of compute); chunking brings
        the driver loop to one dispatch + one host read per K epochs while
        keeping per-epoch eval/selection semantics bit-identical."""
        train_step = self._make_train_step()
        eval_step = self._make_eval_step()
        base_rng = jax.random.PRNGKey(self.seed)

        def chunk(state, best, start_epoch, graph_x, k: int):
            graph, x = graph_x

            def body(carry, epoch):
                state, best = carry
                rng = jax.random.fold_in(base_rng, epoch)
                state, m = train_step(state, rng, graph, x)
                logits, feats, accs, losses = eval_step(
                    state.params, state.batch_stats, graph, x
                )
                better = losses[1] < best["val_loss"]

                def pick(new, old):
                    return jnp.where(better, new, old)

                best = {
                    "val_loss": pick(losses[1], best["val_loss"]),
                    "val_acc": pick(accs[1], best["val_acc"]),
                    "test_acc": pick(accs[2], best["test_acc"]),
                    "logits": pick(logits, best["logits"]),
                    "feats": pick(feats, best["feats"]),
                    # best-val params ride the carry (~6 MB) so artifacts can
                    # be re-dumped post-hoc under any label_mode (dump_outputs)
                    "params": jax.tree_util.tree_map(
                        pick, state.params, best["params"]
                    ),
                    "batch_stats": jax.tree_util.tree_map(
                        pick, state.batch_stats, best["batch_stats"]
                    ),
                }
                hist = jnp.stack(
                    [m["loss"], m["train_acc"], accs[0], accs[1], accs[2],
                     losses[0], losses[1], losses[2]]
                )
                return (state, best), hist

            (state, best), hist = jax.lax.scan(
                body, (state, best),
                start_epoch + jnp.arange(k, dtype=jnp.int32),
            )
            return state, best, hist

        return chunk

    def init_best(self):
        """Device-resident best-validation bundle for :meth:`run_epochs`."""
        n = self.graph.num_nodes
        feat_dim = self.cfg.n_hidden * self.cfg.n_heads
        return {
            "val_loss": jnp.asarray(jnp.inf, jnp.float32),
            "val_acc": jnp.zeros((), jnp.float32),
            "test_acc": jnp.zeros((), jnp.float32),
            "logits": jnp.zeros((n, self.num_classes), jnp.float32),
            "feats": jnp.zeros((n, feat_dim), jnp.float32),
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }

    def run_epochs(self, start_epoch: int, k: int, best=None):
        """Run ``k`` epochs on device; returns ``(best, hist)`` where hist is
        float32[k, 8]: (train_loss, train_acc, acc_tr/va/te, loss_tr/va/te).
        """
        if best is None:
            best = self.init_best()
        self.state, best, hist = self._epoch_chunk(
            self.state, best, jnp.int32(start_epoch), (self.graph, self.x), k
        )
        return best, hist

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), epoch)
        self.state, m = self._train_step(self.state, rng, self.graph, self.x)
        return {k: float(v) for k, v in m.items()}

    def evaluate(self):
        logits, feats, accs, losses = self._eval_step(
            self.state.params, self.state.batch_stats, self.graph, self.x
        )
        return (
            logits,
            feats,
            tuple(float(a) for a in accs),
            tuple(float(l) for l in losses),
        )

    def num_params(self) -> int:
        return sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.state.params)
        )
