"""Oracle-teacher controls: why arxiv-shaped planted-label synthetic tasks
show no logit-KD gain for the GCN student (round-5 analysis).

    python experiments/probe_kd_headroom.py [--scale micro|full]

Round 4 diagnosed the flat KD results as teacher-dump label-noise leakage.
Round 5 fixed the dumps (``--dump-labels self``: teacher quality preserved
with NO label inputs, 77.7/77.0 train/test on the hard task) — and the KD
results did not move. This probe chain isolates why, with the strongest
possible control: an ORACLE teacher whose logits are confident one-hots of
the TRUE (pre-noise) labels. If even the oracle cannot lift the student,
no real teacher, dump scheme, or loss scaling can.

Findings (TPU/CPU runs recorded in RESULTS.md round-5 notes):

1. **micro scale** (2k nodes, 1k train, 40% uniform label noise): oracle
   KD (batchmean, T=1) lifts the GCN **+4.2** over supervised — the KD
   mechanics and the batchmean reduction work.
2. **arxiv-like scale** (20k+ nodes, any probed noise kind/level/split,
   hierarchical or flat classes, feature-sparse or not): oracle KD is
   within ±0.5 of supervised, and a pure oracle CLONE (alpha=1: literally
   CE on clean confident targets) matches CE on 40%-noisy labels.
   **Training-target quality is washed out by transductive structure** —
   label noise is not a binding constraint for the GCN at scale, so there
   is no headroom for ANY distillation signal to occupy.
3. Architecture-locked knowledge does not transfer: distilling a SAGE or
   GAT teacher that beats the GCN by 10+ points moves the GCN by ~0 —
   the teacher's advantage is not expressible in the student's class.

Consequence: the reference's +0.3 arxiv gain is a property of real-data
structure (feature noise that soft targets calibrate), not reproducible on
planted-label generators; the framework demonstrates the KD gain direction
where headroom exists — inductive PPI (+0.95 F1) and graph-level molhiv —
and the real-data path is rehearsed at full scale for the day a real cache
is mounted (experiments/r5_realscale.sh).
"""

from __future__ import annotations

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from efficient_gnns_tpu.graphs.preprocess import build_graph
from efficient_gnns_tpu.models import GCN
from efficient_gnns_tpu.train import DistillConfig, NodeDistillTrainer


def gen(n, e, C, noise, noise_kind="uniform", n_super=0, sparse=0.0,
        signal=0.35, train_frac=0.54, feat_dim=128, seed=42):
    rng = np.random.default_rng(seed)
    s = rng.zipf(1.4, size=e * 2) % n
    r = rng.integers(0, n, size=e * 2)
    keep = s != r
    s, r = s[keep][:e], r[keep][:e]
    if n_super:
        n_sub = C // n_super
        supers = rng.normal(size=(n_super, feat_dim)).astype(np.float32)
        subs = rng.normal(size=(C, feat_dim)).astype(np.float32)
        protos = supers.repeat(n_sub, axis=0) + 0.4 * subs
    else:
        protos = rng.normal(size=(C, feat_dim)).astype(np.float32)
    y = rng.integers(0, C, size=n)
    for _ in range(2):
        yn = y.copy()
        yn[r] = y[s]
        y = yn
    x = protos[y] * signal + rng.normal(size=(n, feat_dim)).astype(np.float32)
    if sparse > 0:
        blank = rng.random(n) < sparse
        x = np.where(blank[:, None],
                     rng.normal(size=x.shape).astype(np.float32), x)
    y_clean = y.copy()
    flip = rng.random(n) < noise
    if noise_kind == "sibling" and n_super:
        n_sub = C // n_super
        wrong = (y // n_sub) * n_sub + rng.integers(0, n_sub, size=n)
    else:
        wrong = rng.integers(0, C, size=n)
    y = np.where(flip, wrong, y)
    perm = rng.permutation(n)
    ntr, nva = int(train_frac * n), int(0.18 * n)
    split = {"train": np.sort(perm[:ntr]).astype(np.int32),
             "valid": np.sort(perm[ntr:ntr + nva]).astype(np.int32),
             "test": np.sort(perm[ntr + nva:]).astype(np.int32)}
    g = build_graph(s, r, n, bidirected=True, self_loops=True)
    tl = np.full((n, C), -2.0, np.float32)
    tl[np.arange(n), y_clean] = 4.0  # oracle: confident at the TRUE class
    return g, x.astype(np.float32), y.astype(np.int32), split, C, jnp.asarray(tl)


def train_gcn(g, x, y, split, C, hidden, mode="supervised", tl=None,
              alpha=0.9, T=1.0, red="batchmean", epochs=150):
    cfg = DistillConfig(training=mode, hidden=hidden, num_layers=2,
                        dropout=0.5, lr=0.01, alpha=alpha, kd_T=T,
                        kd_reduction=red)
    tr = NodeDistillTrainer(
        GCN(hidden=hidden, out_feats=C, num_layers=2, dropout=0.5),
        cfg, g, x, y, split, teacher_logits=tl, seed=0)
    best = 0.0
    for chunk in range(epochs // 30):
        tr.run_epochs(chunk * 30 + 1, 30)
        _, accs = tr.evaluate()
        best = max(best, accs[1])
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["micro", "full"], default="micro")
    a = p.parse_args()
    if a.scale == "micro":
        cells = [dict(n=2000, e=12000, C=10, noise=0.4, train_frac=0.5,
                      signal=0.4, hidden=64)]
    else:
        cells = [
            dict(n=20000, e=140000, C=40, noise=0.4, train_frac=0.10, hidden=256),
            dict(n=20000, e=140000, C=40, noise=0.25, noise_kind="sibling",
                 n_super=8, sparse=0.3, train_frac=0.10, hidden=256),
        ]
    for cell in cells:
        hidden = cell.pop("hidden")
        g, x, y, split, C, tl = gen(**cell)
        sup = train_gcn(g, x, y, split, C, hidden)
        kd = train_gcn(g, x, y, split, C, hidden, mode="kd", tl=tl)
        clone = train_gcn(g, x, y, split, C, hidden, mode="kd", tl=tl,
                          alpha=1.0)
        print(f"{cell}: sup {sup:.4f}  oracle-kd(a.9) {kd:.4f} "
              f"({(kd - sup) * 100:+.2f})  oracle-clone(a1) {clone:.4f} "
              f"({(clone - sup) * 100:+.2f})", flush=True)


if __name__ == "__main__":
    main()
