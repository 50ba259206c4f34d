"""Pallas row-gather kernel (experimental — measured, NOT dispatched).

Measured on v5e against the jitted XLA vmap row gather
(`ops.grouping.batched_index_gather`):

  B32 N512  C131 M128 K64: xla 4.42 ms | pallas 4.18 ms
  B32 N512  C128 M128 K64: xla 2.69 ms | pallas 3.05 ms
  B32 N2048 C3   M512 K32: xla 4.72 ms | pallas 5.29 ms

i.e. the dynamic-sublane row-copy loop only ties XLA's gather (both run far
off the HBM roofline; the per-row dependency serializes).  Kept as the
reference point for future gather work; the hot path stays on XLA's gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_point_pallas"]


def _gather_kernel(idx_ref, src_ref, out_ref, *, rows_per_block: int):
    # idx_ref: SMEM [1, 1, 1, QB] block (4-D so the last-two-dims tile rule
    # is satisfied); src_ref: VMEM [1, N, C]; out_ref: VMEM [1, QB, C].
    def body(j, _):
        row = idx_ref[0, 0, 0, j]
        out_ref[0, pl.ds(j, 1), :] = src_ref[0, pl.ds(row, 1), :]
        return 0

    lax.fori_loop(0, rows_per_block, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def group_point_pallas(
    points: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """[B, N, C], [B, M, K] -> [B, M, K, C] (forward only — use for
    inference paths; training uses the autodiff XLA gather)."""
    b, n, c = points.shape
    _, m, k = idx.shape
    q = m * k
    rows_per_block = q
    for cand in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if q % cand == 0:
            rows_per_block = cand
            break
    flat_idx = idx.reshape(b, q // rows_per_block, 1, rows_per_block).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows_per_block=rows_per_block),
        grid=(b, q // rows_per_block),
        in_specs=[
            pl.BlockSpec((1, 1, 1, rows_per_block), lambda b_, j: (b_, j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, c), lambda b_, j: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, c), lambda b_, j: (b_, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, q, c), points.dtype),
        interpret=interpret,
    )(flat_idx, points)
    return out.reshape(b, m, k, c)
