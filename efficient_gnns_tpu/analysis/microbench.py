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
