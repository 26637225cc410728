"""Pallas TPU kernel: blocked one-hot segment-matmul scatter.

The scatter half of SpMM — ``out[r] += msg_e`` for receiver-sorted edges —
re-expressed as MXU work: per edge block, build the one-hot matrix of local
destination rows in VMEM (VPU compare against an iota) and accumulate
``onehot^T @ msgs`` into the owning output row tile. Consecutive grid steps
that share a row tile keep the output block resident in VMEM (TPU grids are
sequential), so multi-block tiles accumulate without HBM round trips.

This replaces XLA's scatter-add lowering (measured 17.8 ms for ogbn-arxiv's
1.9M-edge f32[...,128] scatter on TPU v5e vs ~1-2 ms here) and is bitwise
deterministic. Layout comes from graphs/blocking.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficient_gnns_tpu.graphs.blocking import EdgeBlocking


def _kernel(tile_ref, first_ref, dst_ref, msgs_ref, out_ref, *, eb, tm):
    i = pl.program_id(0)
    dst = dst_ref[0, 0, :]  # [EB] int32; == tm for padding slots
    cols = jax.lax.broadcasted_iota(jnp.int32, (eb, tm), 1)
    onehot = (dst[:, None] == cols).astype(msgs_ref.dtype)
    # f32 messages need HIGHEST (bf16x3 passes) — the MXU's default single
    # bf16 pass rounds f32 operands to ~4e-3 relative error. The one-hot
    # operand is exact in bf16 either way; bf16 messages take the fast path.
    precision = (
        jax.lax.Precision.DEFAULT
        if msgs_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    partial = jax.lax.dot_general(
        onehot,
        msgs_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # [TM, F]

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[0] = partial

    @pl.when(first_ref[i] == 0)
    def _():
        out_ref[0] = out_ref[0] + partial


def blocked_segment_sum(
    msgs: jnp.ndarray,  # [nb*EB, F] blocked edge messages (bf16 or f32)
    blocking: EdgeBlocking,
    num_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns float32[num_rows, F] segment sums over the blocked layout.

    F must be a multiple of 128 (callers pad; see ops/spmm.py).
    """
    nb, eb, tm = blocking.num_blocks, blocking.eb, blocking.tm
    f = msgs.shape[-1]
    assert msgs.shape[0] == nb * eb, (msgs.shape, nb, eb)
    assert f % 128 == 0, f"feature dim {f} must be a multiple of 128"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_idx, first_flag
        grid=(nb,),
        in_specs=[
            # [nb, 1, EB] so the trailing block dims equal the array dims
            # (TPU lowering requires (8,128)-divisible or full-dim blocks)
            pl.BlockSpec((1, 1, eb), lambda i, tile_ref, first_ref: (i, 0, 0)),
            pl.BlockSpec((eb, f), lambda i, tile_ref, first_ref: (i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tm, f), lambda i, tile_ref, first_ref: (tile_ref[i], 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eb=eb, tm=tm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((blocking.num_tiles, tm, f), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * eb * tm * f,
            bytes_accessed=msgs.size * msgs.dtype.itemsize
            + blocking.num_tiles * tm * f * 4,
            transcendentals=0,
        ),
    )(
        blocking.tile_idx,
        blocking.first_flag,
        blocking.dst_local.reshape(nb, 1, eb),
        msgs,
    )
    return out.reshape(blocking.num_tiles * tm, f)[:num_rows]
