"""Segment reductions — the scatter/gather floor of the framework.

These replace torch-scatter's segment ops (used inside every PyG conv and in
``torch_geometric.utils.softmax``; reference ``arxiv_pyg/criterion.py:103-113``)
and DGL's reduce kernels. The framework keeps edges *sorted by segment id*
(see graphs/container.py), so every reduction here runs with
``indices_are_sorted=True`` — on TPU the sorted scatter is deterministic
(bitwise reproducible), unlike the reference's CUDA atomics.

Padding convention: segment ids ``>= num_segments`` are dropped by the
underlying scatter, so padded edges vanish without mask multiplies.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather with clipped out-of-range indices (padding-safe)."""
    return jnp.take(x, idx, axis=0, mode="clip")


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Mean over each segment; empty segments yield 0."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1)
    return total / count.reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Max over each segment; empty segments yield -inf."""
    return jax.ops.segment_max(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    return jax.ops.segment_min(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def _softmax_fwd(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray],
):
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    seg_max = segment_max(logits, segment_ids, num_segments)
    seg_max = jnp.maximum(seg_max, jnp.finfo(logits.dtype).min)  # empty segments
    shifted = logits - gather(seg_max, segment_ids)
    z = jnp.exp(shifted)
    if mask is not None:
        z = jnp.where(mask, z, 0.0)
    else:
        z = jnp.where(segment_ids < num_segments, z, 0.0)
    denom = segment_sum(z, segment_ids, num_segments)
    denom = jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)
    return z / gather(denom, segment_ids)


def float0_like(x):
    """Zero cotangent for an integer/bool primal (what custom_vjp expects)."""
    import numpy as np

    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _segment_softmax(logits, segment_ids, num_segments: int, mask):
    return _softmax_fwd(logits, segment_ids, num_segments, mask)


def _segment_softmax_fwd(logits, segment_ids, num_segments, mask):
    p = _softmax_fwd(logits, segment_ids, num_segments, mask)
    return p, (p, segment_ids, mask)


def _segment_softmax_bwd(num_segments, res, g):
    # d logits = p * (g - sum_seg(p * g))   (standard softmax VJP per segment)
    p, segment_ids, mask = res
    inner = segment_sum(p * g, segment_ids, num_segments)
    dlogits = p * (g - gather(inner, segment_ids))
    dmask = None if mask is None else float0_like(mask)
    return dlogits, float0_like(segment_ids), dmask


_segment_softmax.defvjp(_segment_softmax_fwd, _segment_softmax_bwd)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax normalized within each segment.

    The GAT attention-normalization primitive (DGL ``edge_softmax``,
    reference ``arxiv_dgl/models.py:212-214``) and the LSP loss normalizer
    (``arxiv_pyg/criterion.py:103``). Entries with out-of-range ids or
    ``mask == False`` get probability 0 and receive no gradient.
    """
    return _segment_softmax(logits, segment_ids, num_segments, mask)
