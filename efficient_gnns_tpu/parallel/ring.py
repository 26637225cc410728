"""Ring/blockwise computation of the global N x N similarity structures.

The GSP loss and the G-CRD InfoNCE logits are dense Gram matrices over a
node subset (reference ``arxiv_pyg/criterion.py:72-84`` and ``:142``); the
reference caps their size with ``max_samples`` subsampling
(``criterion.py:62-65,134-137``) because an N x N matrix must fit one GPU.
Here the cap becomes a *mesh* limit instead: rows are sharded over the
``data`` axis and the Gram is computed block-by-block while chunks rotate
around the ring (``lax.ppermute`` over ICI) — the ring-attention pattern
without the softmax-weighted V (SURVEY.md section 2.5, "context parallel"
row). No D x (N x N) materialization ever happens; per-step memory is
(N/D)^2.

For the InfoNCE term the ring carries an online-logsumexp accumulator
(running max + running sum-exp per local row, flash-attention style), so
softmax normalization over all N columns needs only one rotation sweep.

Both functions are differentiable (autodiff through ``ppermute`` reverses
the ring) and reduce to the single-device ``distill.criteria`` terms — the
equivalence is tested on the virtual CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _l2_normalize(x, eps: float = 1e-12):
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)


def _block_gram(za, zb, kernel: str):
    """Similarity block between row chunks ``za`` [m,d] and ``zb`` [k,d].

    Chunks are pre-normalized for cosine/poly (normalization is row-local so
    it happens before the ring).
    """
    if kernel in ("cosine", "poly"):
        g = za @ zb.T
        return g * g if kernel == "poly" else g
    sqa = jnp.sum(za * za, axis=-1)
    sqb = jnp.sum(zb * zb, axis=-1)
    d2 = jnp.maximum(sqa[:, None] + sqb[None, :] - 2.0 * (za @ zb.T), 0.0)
    if kernel == "l2":
        return jnp.sqrt(d2 + 1e-12)
    if kernel == "rbf":
        return jnp.exp(-0.5 * d2)
    raise NotImplementedError(kernel)


def ring_gsp_term(
    mesh: Mesh,
    feat: jnp.ndarray,
    teacher_feat: jnp.ndarray,
    kernel: str = "cosine",
    axis: str = "data",
) -> jnp.ndarray:
    """Distributed ``gsp_term``: mean (G_s - G_t)^2 over the full N x N Gram.

    ``feat``/``teacher_feat`` are [N, d_s] / [N, d_t], N divisible by the
    mesh axis size; rows are (re)sharded over ``axis``.
    """
    n = feat.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, f"rows ({n}) must divide the '{axis}' axis ({d})"

    def local(f_local, t_local):
        f_local = f_local.astype(jnp.float32)
        t_local = t_local.astype(jnp.float32)
        if kernel in ("cosine", "poly"):
            f_local = _l2_normalize(f_local)
            t_local = _l2_normalize(t_local)
        perm = [(i, (i + 1) % d) for i in range(d)]

        def step(k, carry):
            acc, f_rot, t_rot = carry
            gs = _block_gram(f_local, f_rot, kernel)
            gt = _block_gram(t_local, t_rot, kernel)
            acc = acc + jnp.sum(jnp.square(gs - gt))
            f_rot = jax.lax.ppermute(f_rot, axis, perm)
            t_rot = jax.lax.ppermute(t_rot, axis, perm)
            return acc, f_rot, t_rot

        acc, _, _ = jax.lax.fori_loop(
            0, d, step, (jnp.zeros((), jnp.float32), f_local, t_local)
        )
        return jax.lax.psum(acc, axis)[None]

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis),
        check_vma=False,
    )(feat, teacher_feat)
    return out[0] / (n * n)


def ring_nce_term(
    mesh: Mesh,
    feat: jnp.ndarray,
    teacher_feat: jnp.ndarray,
    nce_T: float = 0.075,
    axis: str = "data",
) -> jnp.ndarray:
    """Distributed ``nce_term``: InfoNCE with all N rows as candidates.

    Student row i's positive is teacher row i; the ring rotates teacher
    chunks and accumulates an online logsumexp per local student row.
    """
    n = feat.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, f"rows ({n}) must divide the '{axis}' axis ({d})"

    def local(f_local, t_local):
        f_local = _l2_normalize(f_local.astype(jnp.float32))
        t_local = _l2_normalize(t_local.astype(jnp.float32))
        m_loc = f_local.shape[0]
        perm = [(i, (i + 1) % d) for i in range(d)]

        def step(k, carry):
            run_max, run_sum, t_rot = carry
            logits = (f_local @ t_rot.T) / nce_T  # [m, m]
            blk_max = jnp.max(logits, axis=-1)
            new_max = jnp.maximum(run_max, blk_max)
            run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.sum(
                jnp.exp(logits - new_max[:, None]), axis=-1
            )
            t_rot = jax.lax.ppermute(t_rot, axis, perm)
            return new_max, run_sum, t_rot

        init = (
            jnp.full((m_loc,), -jnp.inf, jnp.float32),
            jnp.zeros((m_loc,), jnp.float32),
            t_local,
        )
        run_max, run_sum, _ = jax.lax.fori_loop(0, d, step, init)
        pos = jnp.sum(f_local * t_local, axis=-1) / nce_T  # diagonal logits
        nll = (run_max + jnp.log(run_sum)) - pos
        return jax.lax.psum(jnp.sum(nll), axis)[None]

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis),
        check_vma=False,
    )(feat, teacher_feat)
    return out[0] / n
