"""SIGN training CLI (reference ``arxiv_dgl/sign.py:555-605`` flags).

    python -m efficient_gnns_tpu.cli.sign --R 5 --training kd \\
        --teacher_dir teacher_dumps/gat-3L250x3h
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("SIGN on ogbn-arxiv (TPU)")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--expt_name", type=str, default="debug")
    p.add_argument("--training", type=str, default="supervised",
                   choices=["supervised", "kd", "fitnet", "at", "gpw", "nce"])
    p.add_argument("--kd_and_aux", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_runs", type=int, default=10)
    p.add_argument("--num_epochs", type=int, default=1000)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--R", type=int, default=5, help="number of hops")
    p.add_argument("--num_hidden", type=int, default=512)
    p.add_argument("--ff_layer", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--input_dropout", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=50000)
    p.add_argument("--eval_batch_size", type=int, default=100000)
    p.add_argument("--alpha", type=float, default=0.9)
    p.add_argument("--kd_T", type=float, default=4.0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--kernel", type=str, default="cosine")
    p.add_argument("--max_samples", type=int, default=8192)
    p.add_argument("--proj_dim", type=int, default=256)
    p.add_argument("--nce_T", type=float, default=0.075)
    p.add_argument("--teacher_dir", type=str, default=None)
    p.add_argument("--num_nodes", type=int, default=20000)
    p.add_argument("--num_edges", type=int, default=120000)
    p.add_argument("--signal", type=float, default=0.8,
                   help="synthetic class-signal strength (lower = harder)")
    p.add_argument("--label_noise", type=float, default=0.0)
    p.add_argument("--out_dir", type=str, default="logs")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override (cpu|tpu); see cli.apply_platform")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from efficient_gnns_tpu.cli import apply_platform

    apply_platform(args.platform)
    import jax
    import jax.numpy as jnp

    from efficient_gnns_tpu.distill.artifacts import load_teacher_dump
    from efficient_gnns_tpu.sampling import neighbor_average_features
    from efficient_gnns_tpu.train.config import DistillConfig
    from efficient_gnns_tpu.train.logger import Logger
    from efficient_gnns_tpu.train.sign_trainer import SIGNTrainer

    if args.dataset == "synthetic":
        from efficient_gnns_tpu.data import synthetic_node_dataset

        ds = synthetic_node_dataset(
            num_nodes=args.num_nodes, num_edges=args.num_edges, seed=42,
            signal=args.signal, label_noise=args.label_noise,
        )
    else:
        from efficient_gnns_tpu.data.ogb import load_ogbn_arxiv

        ds = load_ogbn_arxiv()

    t0 = time.time()
    feats = neighbor_average_features(ds.graph, jnp.asarray(ds.x), args.R)
    print(f"hop precompute (R={args.R}) in {time.time() - t0:.1f}s "
          f"on {jax.devices()[0]}")

    cfg = DistillConfig(
        training=args.training, kd_and_aux=args.kd_and_aux,
        hidden=args.num_hidden, dropout=args.dropout, lr=args.lr,
        weight_decay=args.weight_decay, alpha=args.alpha, kd_T=args.kd_T,
        beta=args.beta, kernel=args.kernel, max_samples=args.max_samples,
        proj_dim=args.proj_dim, nce_T=args.nce_T,
    )

    logger = Logger(args.num_runs)
    for run in range(args.num_runs):
        seed = args.seed + run
        t_feat = t_logits = None
        if cfg.needs_teacher():
            if args.teacher_dir:
                f_, l_ = load_teacher_dump(args.teacher_dir, seed)
                t_feat, t_logits = jnp.asarray(f_), jnp.asarray(l_)
            else:
                rng = np.random.default_rng(7)
                protos = rng.normal(size=(ds.num_classes, 64)).astype(np.float32)
                t_feat = jnp.asarray(protos[ds.y])
                tl = np.full((len(ds.y), ds.num_classes), -2.0, np.float32)
                tl[np.arange(len(ds.y)), ds.y] = 4.0
                t_logits = jnp.asarray(tl)

        trainer = SIGNTrainer(
            cfg, feats, ds.y, ds.split_idx, ds.num_classes,
            batch_size=args.batch_size, eval_batch_size=args.eval_batch_size,
            teacher_feat=t_feat, teacher_logits=t_logits,
            ff_layers=args.ff_layer, input_drop=args.input_dropout, seed=seed,
        )
        if run == 0:
            print("# Params:", trainer.num_params())
        for epoch in range(1, args.num_epochs + 1):
            m = trainer.train_epoch(epoch)
            if epoch % args.eval_every == 0 or epoch == args.num_epochs:
                accs = trainer.evaluate()
                logger.add_result(run, accs)
                print(f"Run {run} Epoch {epoch} loss {m['loss']:.4f} "
                      f"train/val/test {accs[0]:.4f}/{accs[1]:.4f}/{accs[2]:.4f}")
        logger.print_statistics(run)
    logger.print_statistics()

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(
        args.out_dir, f"sign-{args.expt_name}-{args.training}.json"
    ), "w") as f:
        json.dump({"args": vars(args), "statistics": logger.statistics()}, f)


if __name__ == "__main__":
    main()
