"""Fused farthest-point-sampling Pallas kernel.

Replaces the reference CUDA kernel (tf_sampling_g.cu:105-170) and the lax.scan
fallback (ops/fps.py).  FPS is inherently sequential over the npoint selection
steps; the win on TPU is keeping the ENTIRE batch's min-distance state and
coordinates resident in VMEM across all steps, so each step is pure VPU work
on [B, N] tiles with zero HBM traffic:

  state:  min_dist [B, N] f32 (VMEM scratch), selected coords x0/y0/z0 [B, 1]
  step j: d = (x - x0)² + (y - y0)² + (z - z0)²          (VPU, [B, N])
          min_dist = min(min_dist, d)
          best     = argmax_rows(min_dist)                ([B])
          idx[:, j] = best
          x0 = Σ_lanes x · onehot(best), ...              (masked row reduce)

Semantics identical to the CUDA kernel: first index is always 0
(tf_sampling_g.cu:115-116), distances squared, ties to the lowest index
(jnp.argmax first-occurrence).

VMEM budget: x/y/z + min_dist at [B, N] f32 → 4·B·N·4 bytes; B=32, N=2048 is
1 MB — comfortably resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fps_pallas"]


def _fps_kernel(xyz_ref, idx_ref, mind_ref, idx_t_ref, *, npoint: int):
    # xyz_ref: [B, 3, N] f32 in VMEM; idx_ref: [B, npoint] int32 out;
    # mind_ref: [B, N] f32 scratch; idx_t_ref: [npoint, B] int32 scratch.
    #
    # Indices accumulate TRANSPOSED ([npoint, B]) because Mosaic only allows
    # dynamic vector stores at sublane (row) granularity — a per-step store
    # to a dynamic lane offset of idx_ref would need 128-alignment.  One
    # transpose at the end restores [B, npoint].
    #
    # NOTE a [3B, N] plane-stacked variant (fewer, wider passes) measured
    # identical wall time — the 511 dependent rounds are bound by the
    # argmax-reduce + loop-step latency, not by pass count — and its
    # sublane concats hit Mosaic lowering gaps at B >= 43 (1-D concat
    # "outside the first tile"; bool-vector sublane concat bitcast_vreg).
    # Per-plane extraction is the robust form.
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    b, n = x.shape

    mind_ref[:, :] = jnp.full((b, n), 1e38, jnp.float32)
    idx_t_ref[0, :] = jnp.zeros((b,), jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)

    def step(j, carry):
        # One selection: update min-dist with the last point, argmax, extract.
        x0, y0, z0 = carry  # [B, 1] coords of the last selected point
        d = (x - x0) ** 2 + (y - y0) ** 2 + (z - z0) ** 2
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        best = jnp.argmax(mind, axis=1).astype(jnp.int32)  # [B]
        idx_t_ref[pl.ds(j, 1), :] = best[None, :]
        onehot = (col == best[:, None]).astype(jnp.float32)
        nx = jnp.sum(x * onehot, axis=1, keepdims=True)
        ny = jnp.sum(y * onehot, axis=1, keepdims=True)
        nz = jnp.sum(z * onehot, axis=1, keepdims=True)
        return (nx, ny, nz)

    # Seed: point 0 of every cloud.  Two selections per loop iteration
    # (npoint is even in every SA config): the rounds are strictly
    # dependent, but halving the fori_loop trips shaves loop overhead off
    # the latency-bound chain (1.44 -> 1.38 ms at B32 2048→512).
    init = (x[:, 0:1], y[:, 0:1], z[:, 0:1])
    if npoint % 2 == 0:
        def body2(i, carry):
            return step(2 * i + 3, step(2 * i + 2, carry))

        lax.fori_loop(0, (npoint - 2) // 2, body2, step(1, init))
    else:
        lax.fori_loop(1, npoint, step, init)
    idx_ref[:, :] = idx_t_ref[:, :].T


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas(xyz: jnp.ndarray, npoint: int, interpret: bool = False) -> jnp.ndarray:
    """Farthest point sampling: [B, N, 3] -> int32 [B, npoint]."""
    b, n, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b, n), jnp.float32),
            pltpu.VMEM((npoint, b), jnp.int32),
        ],
        interpret=interpret,
    )(xyz_t)
    return lax.stop_gradient(idx)
