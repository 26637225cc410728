"""ogbn-mag R-GCN training CLI (reference ``mag_pyg/gnn.py:485-526`` flags)."""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser("R-GCN on ogbn-mag (TPU)")
    p.add_argument("--dataset", type=str, default="synthetic")
    p.add_argument("--expt_name", type=str, default="debug")
    p.add_argument("--training", type=str, default="supervised",
                   choices=["supervised", "kd", "fitnet", "at", "gpw", "lpw", "nce"])
    p.add_argument("--kd_and_aux", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--hidden_channels", type=int, default=32)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--batch_size", type=int, default=20000)
    p.add_argument("--num_steps", type=int, default=30)
    p.add_argument("--alpha", type=float, default=0.9)
    p.add_argument("--kd_T", type=float, default=4.0)
    p.add_argument("--beta", type=float, default=100.0)
    p.add_argument("--kernel", type=str, default="cosine")
    p.add_argument("--max_samples", type=int, default=8192)
    p.add_argument("--proj_dim", type=int, default=128)
    p.add_argument("--nce_T", type=float, default=0.075)
    p.add_argument("--teacher_path", type=str, default=None)
    p.add_argument("--teacher_hidden", type=int, default=512)
    p.add_argument("--teacher_layers", type=int, default=3)
    p.add_argument("--out_dir", type=str, default="logs")
    p.add_argument("--time_steps", type=int, default=0,
                   help="after training, time N jitted train steps on ONE "
                        "resident sampled subgraph — device-only step time, "
                        "host sampling/upload excluded")
    p.add_argument("--no_typed_square", action="store_true",
                   help="disable the typed-square single-pass R-GCN SpMM "
                        "(falls back to R relation-masked passes; for "
                        "step-time comparisons)")
    p.add_argument("--save_ckpt", type=str, default=None,
                   help="directory to save per-seed model checkpoints "
                        "(seed<k>.msgpack) — a teacher run saved here is "
                        "loadable via --teacher_path")
    # synthetic sizing / difficulty (data/mag.py knobs)
    p.add_argument("--n_paper", type=int, default=4000)
    p.add_argument("--signal", type=float, default=0.8)
    p.add_argument("--label_noise", type=float, default=0.0)
    p.add_argument("--homophily", type=float, default=0.5)
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override (cpu|tpu); see cli.apply_platform")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from efficient_gnns_tpu.cli import apply_platform

    apply_platform(args.platform)
    import jax

    from efficient_gnns_tpu.train.checkpoint import load_pytree
    from efficient_gnns_tpu.train.config import DistillConfig
    from efficient_gnns_tpu.train.logger import Logger
    from efficient_gnns_tpu.train.mag_trainer import MagTrainer

    if args.dataset == "synthetic":
        from efficient_gnns_tpu.data.mag import synthetic_mag_dataset

        ds = synthetic_mag_dataset(
            n_paper=args.n_paper, seed=42, signal=args.signal,
            label_noise=args.label_noise, homophily=args.homophily,
        )
    else:
        from efficient_gnns_tpu.data.mag import load_ogbn_mag

        ds = load_ogbn_mag()

    cfg = DistillConfig(
        training=args.training, kd_and_aux=args.kd_and_aux,
        num_layers=args.num_layers, hidden=args.hidden_channels,
        dropout=args.dropout, lr=args.lr, alpha=args.alpha, kd_T=args.kd_T,
        beta=args.beta, kernel=args.kernel, max_samples=args.max_samples,
        proj_dim=args.proj_dim, nce_T=args.nce_T,
    )
    logger = Logger(args.runs)
    epoch_seconds = {}  # per-run epoch timings (+ device_step_ms records)
    for run in range(args.runs):
        seed = args.seed + run
        teacher_params = None
        if cfg.needs_teacher() and args.teacher_path:
            ckpt = load_pytree(
                os.path.join(args.teacher_path, f"seed{seed}.msgpack"), None
            )
            teacher_params = ckpt["params"]
        tr = MagTrainer(
            cfg, ds, batch_size=args.batch_size, num_steps=args.num_steps,
            teacher_params=teacher_params, teacher_hidden=args.teacher_hidden,
            teacher_layers=args.teacher_layers, seed=seed,
            typed_square=not args.no_typed_square,
        )
        if run == 0:
            print(f"params: {tr.num_params()}  device: {jax.devices()[0]}  "
                  f"typed_square: {not args.no_typed_square}")
        import time

        epoch_secs = []
        for epoch in range(1, args.epochs + 1):
            t0 = time.time()
            m = tr.train_epoch(epoch)
            dt = time.time() - t0
            epoch_secs.append(dt)
            accs = tr.evaluate()
            logger.add_result(run, accs)
            print(f"Run {run} Epoch {epoch} loss {m['loss']:.4f} "
                  f"epoch {dt:.2f}s ({dt / args.num_steps * 1e3:.0f} ms/step) "
                  f"train/val/test {accs[0]:.4f}/{accs[1]:.4f}/{accs[2]:.4f}",
                  flush=True)
        logger.print_statistics(run)

        if args.time_steps:
            # device-only step time: one resident subgraph, chained steps
            import jax as _jax
            import jax.numpy as _jnp

            # stop the prefetch thread first: sampler RNG/buffers are not
            # thread-safe and the next sample() runs on the main thread
            tr.close()
            sub = tr.sampler.sample()
            sub = sub._replace(
                graph=_jax.device_put(sub.graph),
                typed_graph=None if sub.typed_graph is None
                else _jax.device_put(sub.typed_graph),
            )
            ids = _jax.device_put(_jnp.asarray(sub.node_ids))
            state = tr.state
            rng0 = _jax.random.PRNGKey(0)
            state, m = tr._train_step(state, sub.graph, sub.typed_graph, ids, rng0)
            _jax.block_until_ready(m["loss"])
            t0 = time.time()
            for i in range(args.time_steps):
                state, m = tr._train_step(
                    state, sub.graph, sub.typed_graph, ids,
                    _jax.random.fold_in(rng0, i),
                )
            _ = float(m["loss"])
            dt = (time.time() - t0) / args.time_steps
            print(f"device-only train step: {dt * 1e3:.1f} ms "
                  f"(typed_square={not args.no_typed_square})", flush=True)
            epoch_secs.append({"device_step_ms": dt * 1e3})
        epoch_seconds[f"run{run}"] = epoch_secs
        if args.save_ckpt:
            from efficient_gnns_tpu.train.checkpoint import save_pytree

            save_pytree(
                os.path.join(args.save_ckpt, f"seed{seed}.msgpack"),
                {"params": tr.state.params["model"]},
            )
            print(f"saved checkpoint seed{seed}.msgpack -> {args.save_ckpt}")
        tr.close()
    logger.print_statistics()

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(
        args.out_dir, f"mag-{args.expt_name}-{args.training}.json"
    ), "w") as f:
        json.dump({"args": vars(args), "statistics": logger.statistics(),
                   "epoch_seconds": epoch_seconds}, f)


if __name__ == "__main__":
    main()
