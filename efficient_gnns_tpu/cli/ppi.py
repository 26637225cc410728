"""PPI student training CLI (reference ``ppi_pyg/gnn.py`` flags) and teacher
training (``ppi_pyg/train_teacher.py``) via ``--train_teacher``."""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser("PPI distillation (TPU)")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--expt_name", type=str, default="debug")
    p.add_argument("--train_teacher", action="store_true")
    p.add_argument("--gnn", type=str, default="student",
                   choices=["teacher", "student", "gat", "gcn", "sage"])
    p.add_argument("--training", type=str, default="supervised",
                   choices=["supervised", "kd", "fitnet", "at", "gpw", "lpw", "nce"])
    p.add_argument("--kd_and_aux", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--hidden_channels", type=int, default=68)
    p.add_argument("--num_layers", type=int, default=5)
    p.add_argument("--heads", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--kd_T", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=100.0)
    p.add_argument("--kernel", type=str, default="cosine")
    p.add_argument("--max_samples", type=int, default=8192)
    p.add_argument("--proj_dim", type=int, default=128)
    p.add_argument("--nce_T", type=float, default=0.075)
    p.add_argument("--teacher_path", type=str, default=None)
    p.add_argument("--data_root", type=str, default="dataset/ppi",
                   help="pre-mounted PPI raw cache for --dataset ppi "
                        "({train,valid,test}_{graph.json,feats.npy,...})")
    p.add_argument("--out_dir", type=str, default="logs")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override (cpu|tpu); see cli.apply_platform")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from efficient_gnns_tpu.cli import apply_platform

    apply_platform(args.platform)
    import jax

    from efficient_gnns_tpu.models import PPIGAT, ppi_student, ppi_teacher
    from efficient_gnns_tpu.train.checkpoint import load_pytree, save_pytree
    from efficient_gnns_tpu.train.config import DistillConfig
    from efficient_gnns_tpu.train.logger import Logger
    from efficient_gnns_tpu.train.ppi_trainer import PPITrainer

    if args.dataset == "synthetic":
        from efficient_gnns_tpu.data.ppi import synthetic_ppi_dataset

        ds = synthetic_ppi_dataset(seed=42)
    else:
        # real data from a pre-mounted raw cache; load_ppi raises a clear
        # FileNotFoundError when the cache is absent (no egress here)
        from efficient_gnns_tpu.data.ppi import load_ppi

        ds = load_ppi(args.data_root)

    def make_model(kind):
        if kind == "teacher":
            return ppi_teacher(ds.num_labels)
        if kind == "student":
            return ppi_student(ds.num_labels)
        return PPIGAT(hidden=args.hidden_channels, out_feats=ds.num_labels,
                      num_layers=args.num_layers, heads=args.heads)

    cfg = DistillConfig(
        training="supervised" if args.train_teacher else args.training,
        kd_and_aux=args.kd_and_aux, lr=args.lr, alpha=args.alpha,
        kd_T=args.kd_T, beta=args.beta, kernel=args.kernel,
        max_samples=args.max_samples, proj_dim=args.proj_dim, nce_T=args.nce_T,
    )

    logger = Logger(args.runs)
    for run in range(args.runs):
        seed = args.seed + run
        if args.train_teacher:
            model = make_model("teacher")
            trainer = PPITrainer(cfg, ds, model, seed=seed)
        else:
            model = make_model(args.gnn)
            teacher = None
            teacher_params = None
            if cfg.needs_teacher():
                teacher = make_model("teacher")
                if args.teacher_path:
                    ckpt = load_pytree(
                        os.path.join(args.teacher_path, f"seed{seed}",
                                     "checkpoint.msgpack"), None
                    )
                    teacher_params = ckpt["params"]
            trainer = PPITrainer(
                cfg, ds, model, teacher=teacher, teacher_params=teacher_params,
                teacher_feat_dim=1024, seed=seed,
            )
        if run == 0:
            print(f"device: {jax.devices()[0]}")

        best_val, final_test = 0.0, 0.0
        for epoch in range(1, args.epochs + 1):
            m = trainer.train_epoch(epoch)
            f1s = trainer.evaluate_all()
            logger.add_result(run, f1s)
            if f1s[1] > best_val:
                best_val, final_test = f1s[1], f1s[2]
                if args.train_teacher:
                    d = os.path.join(args.out_dir, "ppi_teacher",
                                     args.expt_name, f"seed{seed}")
                    save_pytree(os.path.join(d, "checkpoint.msgpack"),
                                {"params": trainer.state.params["model"]})
            print(f"Run {run} Epoch {epoch} loss {m['loss']:.4f} "
                  f"F1 train/val/test {f1s[0]:.4f}/{f1s[1]:.4f}/{f1s[2]:.4f}")
        logger.print_statistics(run)
    logger.print_statistics()

    os.makedirs(args.out_dir, exist_ok=True)
    tag = "teacher" if args.train_teacher else f"{args.gnn}-{args.training}"
    with open(os.path.join(args.out_dir, f"ppi-{args.expt_name}-{tag}.json"), "w") as f:
        json.dump({"args": vars(args), "statistics": logger.statistics()}, f)


if __name__ == "__main__":
    main()
