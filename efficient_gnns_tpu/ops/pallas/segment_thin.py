"""Pallas TPU kernels: blocked segment max / sum for *thin* edge payloads.

XLA lowers ``segment_max`` / ``segment_sum`` over per-edge scalars (GAT
attention logits [E, H], H = heads) to a serialized scatter loop on TPU —
measured tens of ms for ogbn-arxiv's ~2M edges, dominating GAT training.
These kernels reuse the edge blocking of graphs/blocking.py (receiver-sorted
edges chunked into EB-slot blocks, each owned by one TM-row output tile) and
turn the reductions into dense VMEM work:

* sum: one-hot[EB, TM]^T @ vals[EB, H] on the MXU (same trick as
  segment_matmul.py, kept separate because thin payloads skip the feature
  tiling and run with the H-wide minor dimension as a full-dim block);
* max: per-head masked column max over the [EB, TM] one-hot (VPU) —
  max can't ride the MXU, but EB*TM*H compares per block are cheap.

Blocks of one tile are consecutive grid steps, so the output tile stays
resident in VMEM while its blocks accumulate. Padding slots have
``dst_local == TM`` -> all-zero one-hot row -> they contribute nothing
(sum) / -inf (max). Deterministic by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_gnns_tpu.graphs.blocking import EdgeBlocking

_NEG = float(jnp.finfo(jnp.float32).min)


def _sum_kernel(tile_ref, first_ref, dst_ref, vals_ref, out_ref, *, eb, tm):
    i = pl.program_id(0)
    dst = dst_ref[0, 0, :]  # [EB]; == tm for padding slots
    cols = jax.lax.broadcasted_iota(jnp.int32, (eb, tm), 1)
    onehot = (dst[:, None] == cols).astype(jnp.float32)
    partial = jax.lax.dot_general(
        onehot,
        vals_ref[...].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TM, H]

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[0] = partial

    @pl.when(first_ref[i] == 0)
    def _():
        out_ref[0] = out_ref[0] + partial


def _max_kernel(tile_ref, first_ref, dst_ref, vals_ref, out_ref, *, eb, tm, h):
    i = pl.program_id(0)
    dst = dst_ref[0, 0, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (eb, tm), 1)
    onehot = dst[:, None] == cols  # bool [EB, TM]
    vals = vals_ref[...].astype(jnp.float32)  # [EB, H]
    # per-head masked column max (H is static and small: attention heads)
    partial = [
        jnp.max(jnp.where(onehot, vals[:, j][:, None], _NEG), axis=0)[None, :]
        for j in range(h)
    ]
    partial = jnp.concatenate(partial, axis=0).T  # [TM, H]

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[0] = partial

    @pl.when(first_ref[i] == 0)
    def _():
        out_ref[0] = jnp.maximum(out_ref[0], partial)


def _thin_call(kernel, vals, blocking: EdgeBlocking, num_rows: int,
               interpret: bool):
    nb, eb, tm = blocking.num_blocks, blocking.eb, blocking.tm
    h = vals.shape[-1]
    assert vals.shape[0] == nb * eb, (vals.shape, nb, eb)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_idx, first_flag
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, eb), lambda i, tile_ref, first_ref: (i, 0, 0)),
                pl.BlockSpec((eb, h), lambda i, tile_ref, first_ref: (i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, tm, h), lambda i, tile_ref, first_ref: (tile_ref[i], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((blocking.num_tiles, tm, h), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * eb * tm * h,
            bytes_accessed=vals.size * 4 + blocking.num_tiles * tm * h * 4,
            transcendentals=0,
        ),
    )(
        blocking.tile_idx,
        blocking.first_flag,
        blocking.dst_local.reshape(nb, 1, eb),
        vals,
    )
    return out.reshape(blocking.num_tiles * tm, h)[:num_rows]


def blocked_segment_sum_thin(
    vals: jnp.ndarray,  # [nb*EB, H] blocked-order edge values
    blocking: EdgeBlocking,
    num_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """float32[num_rows, H] per-destination sums over the blocked layout."""
    nb, eb, tm = blocking.num_blocks, blocking.eb, blocking.tm
    return _thin_call(
        functools.partial(_sum_kernel, eb=eb, tm=tm),
        vals, blocking, num_rows, interpret,
    )


def _rows_kernel(tile_ref, dst_ref, vals_ref, out_ref, *, eb, tm):
    """Per-slot destination-row read: ``out[slot] = vals[dst_global(slot)]``
    without a random gather — the destination rows of one edge block all live
    in a single resident [TM, H] tile, selected by a one-hot MXU product
    (the dual of the scatter). Padding slots get all-zero rows."""
    dst = dst_ref[0, 0, :]  # [EB]; == tm for padding slots
    cols = jax.lax.broadcasted_iota(jnp.int32, (eb, tm), 1)
    onehot = (dst[:, None] == cols).astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        onehot,
        vals_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [EB, H]


def tile_rows_thin(
    vals: jnp.ndarray,  # [num_tiles*TM, H] float32 per-destination values
    blocking: EdgeBlocking,
    interpret: bool = False,
) -> jnp.ndarray:
    """float32[nb*EB, H] — broadcast per-destination values to their edge
    slots in blocked order (``vals[dst]`` per slot; 0 for padding slots).

    The read half of edge-softmax normalization: per-segment max / reciprocal
    denominators flow back to the edges through resident output tiles instead
    of an HBM row gather.
    """
    nb, eb, tm = blocking.num_blocks, blocking.eb, blocking.tm
    h = vals.shape[-1]
    assert vals.shape[0] == blocking.num_tiles * tm, (vals.shape,)
    out = pl.pallas_call(
        functools.partial(_rows_kernel, eb=eb, tm=tm),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # tile_idx
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1, eb), lambda i, tile_ref: (i, 0, 0)),
                pl.BlockSpec((1, tm, h), lambda i, tile_ref: (tile_ref[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, eb, h), lambda i, tile_ref: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, eb, h), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * eb * tm * h,
            bytes_accessed=nb * eb * h * 4 + nb * tm * h * 4,
            transcendentals=0,
        ),
    )(
        blocking.tile_idx,
        blocking.dst_local.reshape(nb, 1, eb),
        vals.reshape(blocking.num_tiles, tm, h),
    )
    return out.reshape(nb * eb, h)


def blocked_segment_max_thin(
    vals: jnp.ndarray,
    blocking: EdgeBlocking,
    num_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """float32[num_rows, H] per-destination maxima (empty rows = f32 min)."""
    nb, eb, tm = blocking.num_blocks, blocking.eb, blocking.tm
    h = vals.shape[-1]
    return _thin_call(
        functools.partial(_max_kernel, eb=eb, tm=tm, h=h),
        vals, blocking, num_rows, interpret,
    )
