"""Micro-benchmark utilities for tunneled TPU backends.

Two problems make naive timing on a remote/tunneled TPU dishonest:

* dispatch is asynchronous and the relay may cache (program, args) pairs —
  looping ``f(x)`` with identical arguments can report ~0 ms;
* every dispatch pays a tunnel round trip (tens of ms), drowning kernels.

:func:`bench_scan` solves both: the timed loop runs entirely on device as a
``lax.scan`` whose steps are chained through the carry, launched once with a
fresh nonce, and synced with a scalar device->host read.

:func:`cached_graph` caches built :class:`Graph` pytrees (plus companion
arrays) on disk, because host-side graph construction + transfer of ~200 MB
of index arrays through the tunnel costs minutes per process.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Callable, Tuple

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "logs", "cache")


def save_pytree(path: str, tree) -> None:
    """Persist a pytree of arrays (npz + pickled treedef).

    bfloat16 leaves are stored as uint16 bit patterns (np.savez cannot
    serialize ml_dtypes) with the original dtype names pickled alongside."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays, dtypes = [], []
    for l in leaves:
        a = np.asarray(l)
        dtypes.append(a.dtype.name)
        if a.dtype.name == "bfloat16":
            a = a.view(np.uint16)
        arrays.append(a)
    np.savez(path + ".npz", *arrays)
    with open(path + ".treedef", "wb") as f:
        pickle.dump((treedef, dtypes), f)


def load_pytree(path: str):
    """Load a pytree saved by :func:`save_pytree` (leaves stay NumPy)."""
    import jax
    import jax.numpy as jnp

    if not (os.path.exists(path + ".npz") and os.path.exists(path + ".treedef")):
        return None
    with open(path + ".treedef", "rb") as f:
        meta = pickle.load(f)
    treedef, dtypes = meta if isinstance(meta, tuple) else (meta, None)
    z = np.load(path + ".npz")
    leaves = [z[k] for k in z.files]
    if dtypes is not None:
        leaves = [
            l.view(jnp.bfloat16.dtype) if d == "bfloat16" else l
            for l, d in zip(leaves, dtypes)
        ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def cached_graph(key: str, build: Callable[[], object]):
    """Build-or-load a graph pytree cached under ``logs/cache/<key>``."""
    path = os.path.join(_CACHE_DIR, key)
    tree = load_pytree(path)
    if tree is None:
        tree = build()
        try:
            save_pytree(path, tree)
        except Exception:
            pass  # cache is best-effort
    return tree


def bench_scan(fn, init, iters: int = 30, label: str = "",
               verbose: bool = True, const=None, has_aux: bool = False) -> float:
    """Median-free honest timing: one on-device scan of ``iters`` *chained*
    applications of ``fn``, launched with a fresh nonce and ended by a forced
    scalar read. ``fn`` maps carry -> new carry, or, with ``has_aux=True``,
    carry -> ``(new_carry, aux)`` (explicit flag, like ``jax.value_and_grad``
    — a 2-tuple return is otherwise treated as a 2-tuple *carry*); the carry
    MUST thread through the computation, otherwise the body is loop-invariant
    and XLA hoists it out of the scan. Returns ms/iter.

    ``const``: optional loop-invariant pytree (e.g. the Graph) passed as a
    jit *argument* and forwarded as ``fn(const, carry)`` — closing over
    multi-MB index arrays bakes them into the XLA program, which blows the
    remote-compile request limit on tunneled backends (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(const, init, nonce):
        def body(c, _):
            out = fn(c) if const is None else fn(const, c)
            new_c, aux = out if has_aux else (out, jnp.float32(0))
            return new_c, aux

        final, _ = jax.lax.scan(
            body,
            jax.tree_util.tree_map(lambda a: a + nonce, init),
            None, length=iters,
        )
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda a: jnp.sum(a.astype(jnp.float32)), final))

    # Two warmups with distinct nonces, each synced by a *host read* of the
    # scalar (``float``): on tunneled backends ``block_until_ready`` returns
    # before remote execution finishes, and the first execution with fresh
    # arguments pays a large one-time relay cost that compile-warmup alone
    # does not absorb — only a device->host value read is a true barrier.
    _ = float(run(const, init, jnp.float32(0)))
    _ = float(run(const, init, jnp.float32(1e-13)))
    t0 = time.time()
    o = run(const, init, jnp.float32(1e-12))
    _ = float(o)
    dt = (time.time() - t0) / iters * 1e3
    if verbose and label:
        print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


def _gat_step_main(args) -> None:
    """Time the GAT-teacher train/eval step at arxiv shape on the current
    backend — the committed, reproducible form of the step-time measurements
    cited in commit messages (hub attention: 1287 ms -> ~350 ms/step).

        python -m efficient_gnns_tpu.analysis.microbench gat-step \
            --which train --trace --hub auto

    ``--trace`` additionally captures a jax.profiler trace and prints the
    per-op device-time attribution (analysis/timing.py::summarize_trace).
    """
    import jax
    import jax.numpy as jnp

    from efficient_gnns_tpu.data import synthetic_node_dataset
    from efficient_gnns_tpu.ops import dispatch
    from efficient_gnns_tpu.train.gat_teacher import (
        GATTeacherTrainer,
        TeacherConfig,
    )

    if args.msg_dtype:
        dispatch.set_backend(
            hub_message_dtype=getattr(jnp, args.msg_dtype),
            message_dtype=getattr(jnp, args.msg_dtype),
        )
    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    hub = "auto" if args.hub == "auto" else int(args.hub)
    builder = lambda: synthetic_node_dataset(
        num_nodes=args.num_nodes, num_edges=args.num_edges, seed=42,
        hub_dense=hub, gcn_norm=False, label_smoothing_hops=0,
    )
    ds = cached_graph(
        f"arxiv_gat_hub_{args.hub}", builder) if args.cache else builder()
    print(f"graph built in {time.time() - t0:.1f}s "
          f"(hub={'on' if ds.graph.hub is not None else 'off'})", flush=True)

    cfg = TeacherConfig(n_label_iters=1, use_labels=True, edge_drop=0.3,
                        input_drop=0.25, no_attn_dst=True, use_norm=True)
    trainer = GATTeacherTrainer(cfg, ds.graph, ds.x, ds.y, ds.split_idx,
                                ds.num_classes, seed=0)
    print(f"params {trainer.num_params()}", flush=True)

    rng = jax.random.PRNGKey(0)
    if args.which == "train":
        state = trainer.state

        def run(i, state):
            state, m = trainer._train_step(
                state, jax.random.fold_in(rng, i), trainer.graph, trainer.x)
            return state, m["loss"]
    else:
        def run(i, state):
            out = trainer._eval_step(trainer.state.params,
                                     trainer.state.batch_stats,
                                     trainer.graph, trainer.x)
            return state, out[0]

    t0 = time.time()
    state, sync = run(0, trainer.state)
    jax.block_until_ready(sync)
    print(f"{args.which} step compile+first {time.time() - t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        for i in range(args.iters):
            state, sync = run(i, state)
        jax.block_until_ready(sync)
        print(f"{args.which} step: "
              f"{(time.time() - t0) / args.iters * 1e3:.1f} ms", flush=True)

    if args.trace:
        from efficient_gnns_tpu.analysis.timing import (
            capture_trace,
            summarize_trace,
        )

        # pass the ALREADY-jitted step with the graph as an argument —
        # wrapping it in a fresh lambda would bake the multi-MB graph into
        # the traced program as constants (HTTP 413 on tunneled backends)
        if args.which == "train":
            trace_dir = capture_trace(
                trainer._train_step, state, jax.random.fold_in(rng, 0),
                trainer.graph, trainer.x,
                trace_dir=f"/tmp/gat_trace_{args.which}", steps=2,
            )
        else:
            trace_dir = capture_trace(
                trainer._eval_step, trainer.state.params,
                trainer.state.batch_stats, trainer.graph, trainer.x,
                trace_dir=f"/tmp/gat_trace_{args.which}", steps=2,
            )
        summarize_trace(trace_dir)


def _spmm_main(args) -> None:
    """SpMM fwd+bwd at arxiv shape with per-kernel trace attribution — the
    committed ceiling analysis behind the bench's speed-of-light fraction
    (bench.py measures the same op; this breaks the time into kernels)."""
    import jax
    import jax.numpy as jnp

    from efficient_gnns_tpu.data import synthetic_node_dataset
    from efficient_gnns_tpu.ops import spmm

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    ds = synthetic_node_dataset(
        num_nodes=args.num_nodes, num_edges=args.num_edges,
        feat_dim=args.feat_dim, seed=0, label_smoothing_hops=0,
    )
    graph = jax.device_put(ds.graph)
    x = jax.device_put(jnp.asarray(ds.x))
    print(f"graph built in {time.time() - t0:.1f}s", flush=True)

    def fb(graph, x):
        def loss(x):
            return jnp.sum(spmm(graph, x) ** 2)

        _, g = jax.value_and_grad(loss)(x)
        return x + 1e-12 * g

    dt = bench_scan(fb, x, iters=20, verbose=False, const=graph)
    e = int(np.asarray(ds.graph.n_edge))
    sol = 4 * e * args.feat_dim * 4 / 819e9 * 1e3
    print(f"SpMM fwd+bwd: {dt:.2f} ms ({sol / dt:.3f}x of the {sol:.2f} ms "
          f"HBM roofline)", flush=True)

    if args.trace:
        from efficient_gnns_tpu.analysis.timing import (
            capture_trace,
            summarize_trace,
        )

        jfb = jax.jit(fb)
        trace_dir = capture_trace(jfb, graph, x, trace_dir="/tmp/spmm_trace",
                                  steps=2)
        summarize_trace(trace_dir)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("efficient_gnns_tpu microbench")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("spmm", help="SpMM fwd+bwd + kernel attribution")
    s.add_argument("--num-nodes", type=int, default=169_343)
    s.add_argument("--num-edges", type=int, default=1_166_243)
    s.add_argument("--feat-dim", type=int, default=128)
    s.add_argument("--trace", action="store_true")
    g = sub.add_parser("gat-step", help="GAT teacher step time at arxiv shape")
    g.add_argument("--which", choices=["train", "eval"], default="train")
    g.add_argument("--num-nodes", type=int, default=169_343)
    g.add_argument("--num-edges", type=int, default=1_166_243)
    g.add_argument("--hub", default="auto")
    g.add_argument("--iters", type=int, default=5)
    g.add_argument("--msg-dtype", default=None,
                   help="override message dtypes (float32|bfloat16)")
    g.add_argument("--trace", action="store_true",
                   help="capture + summarize a jax.profiler trace")
    g.add_argument("--cache", action="store_true",
                   help="cache the built graph under logs/cache")
    args = p.parse_args(argv)
    if args.cmd == "gat-step":
        _gat_step_main(args)
    elif args.cmd == "spmm":
        _spmm_main(args)


if __name__ == "__main__":
    main()
