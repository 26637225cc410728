"""Learning-curve plots from metrics JSONL.

TPU-build equivalent of the reference's matplotlib training curves
(``arxiv_dgl/gat.py:260-294`` plots loss and accuracy per epoch to PNG).
Reads the JSONL stream written by :class:`train.metrics.MetricsWriter`
instead of re-plumbing values through the trainer.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

from efficient_gnns_tpu.train.metrics import read_jsonl


def _series(rows: List[dict], key: str):
    xs, ys = [], []
    for r in rows:
        if key in r:
            xs.append(r.get("step", len(xs)))
            ys.append(r[key])
    return xs, ys


def plot_curves(
    log_dir: str,
    out_path: Optional[str] = None,
    loss_keys: Iterable[str] = ("loss/train", "loss/cls", "loss/aux"),
    acc_keys: Iterable[str] = ("acc/train", "acc/valid", "acc/test"),
) -> str:
    """Write a two-panel (loss | accuracy) learning-curve PNG.

    Returns the output path. Matplotlib is imported lazily with the Agg
    backend so the helper works headless.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = read_jsonl(log_dir)
    if not rows:
        raise FileNotFoundError(f"no metrics.jsonl rows under {log_dir}")

    fig, (ax_l, ax_a) = plt.subplots(1, 2, figsize=(11, 4))
    for k in loss_keys:
        xs, ys = _series(rows, k)
        if xs:
            ax_l.plot(xs, ys, label=k)
    ax_l.set_xlabel("epoch")
    ax_l.set_ylabel("loss")
    ax_l.legend()
    for k in acc_keys:
        xs, ys = _series(rows, k)
        if xs:
            ax_a.plot(xs, ys, label=k)
    ax_a.set_xlabel("epoch")
    ax_a.set_ylabel("accuracy")
    ax_a.legend()
    fig.tight_layout()
    out_path = out_path or os.path.join(log_dir, "curves.png")
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="plot learning curves from metrics.jsonl")
    p.add_argument("log_dir")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    print(plot_curves(args.log_dir, args.out))


if __name__ == "__main__":
    main()
