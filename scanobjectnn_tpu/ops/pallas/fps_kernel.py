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

__all__ = ["fps_pallas", "fps_pallas_with_coords"]


def _fps_kernel(xyz_ref, *refs, npoint: int, with_coords: bool):
    # xyz_ref: [B, 3, N] f32 in VMEM; then (with_coords selecting the ref
    # layout): idx_ref [B, npoint] int32 out, optionally cx/cy/cz [B, npoint]
    # f32 outs (the selected coordinates — saves the caller a gather_point,
    # which is row-rate-limited at ~1.3 ms for B=128 2048→512), then
    # mind_ref [B, N] f32 scratch and idx_t_ref [npoint, B] int32 scratch.
    #
    # Coordinates accumulate by masked LANE select (out[:, j] = coord of the
    # j-th selection) — a dynamic per-step store to lane j is illegal
    # (sublane granularity only), but `where(lane_iota == j, val, acc)` is
    # three cheap VPU passes per coordinate over [B, npoint].
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
    if with_coords:
        idx_ref, cx_ref, cy_ref, cz_ref, mind_ref, idx_t_ref = refs
        cxa_ref, cya_ref, cza_ref = cx_ref, cy_ref, cz_ref
    else:
        idx_ref, mind_ref, idx_t_ref = refs
    x = xyz_ref[:, 0, :]
    y = xyz_ref[:, 1, :]
    z = xyz_ref[:, 2, :]
    b, n = x.shape

    mind_ref[:, :] = jnp.full((b, n), 1e38, jnp.float32)
    idx_t_ref[0, :] = jnp.zeros((b,), jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)
    if with_coords:
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), dimension=1)
        seed0 = lane == 0
        cxa_ref[:, :] = jnp.where(seed0, x[:, 0:1], 0.0)
        cya_ref[:, :] = jnp.where(seed0, y[:, 0:1], 0.0)
        cza_ref[:, :] = jnp.where(seed0, z[:, 0:1], 0.0)

    def step(j, carry):
        # One selection: update min-dist with the last point, argmax, extract.
        x0, y0, z0 = carry  # [B, 1] coords of the last selected point
        d = (x - x0) ** 2 + (y - y0) ** 2 + (z - z0) ** 2
        mind = jnp.minimum(mind_ref[:, :], d)
        mind_ref[:, :] = mind
        # Manual two-reduce argmax: row max, then the LOWEST column index
        # attaining it — the same first-occurrence tie rule as jnp.argmax
        # (and the CUDA kernel's serial scan, tf_sampling_g.cu:130-160),
        # but 2.4x cheaper than Mosaic's argmax lowering (measured round 5:
        # the argmax marginal drops 0.83 -> 0.34 us/round at B=128 N=2048,
        # the whole round 3.04 -> 2.65 us; scripts/probe_fps_safused.py
        # FPS_MODES=manargmax).
        m = jnp.max(mind, axis=1, keepdims=True)  # [B, 1]
        best = jnp.min(jnp.where(mind == m, col, n), axis=1).astype(
            jnp.int32
        )  # [B]
        idx_t_ref[pl.ds(j, 1), :] = best[None, :]
        onehot = (col == best[:, None]).astype(jnp.float32)
        nx = jnp.sum(x * onehot, axis=1, keepdims=True)
        ny = jnp.sum(y * onehot, axis=1, keepdims=True)
        nz = jnp.sum(z * onehot, axis=1, keepdims=True)
        if with_coords:
            sel = lane == j
            cxa_ref[:, :] = jnp.where(sel, nx, cxa_ref[:, :])
            cya_ref[:, :] = jnp.where(sel, ny, cya_ref[:, :])
            cza_ref[:, :] = jnp.where(sel, nz, cza_ref[:, :])
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
    kernel = functools.partial(_fps_kernel, npoint=npoint, with_coords=False)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((b, n), jnp.float32),
            pltpu.VMEM((npoint, b), jnp.int32),
        ],
        # Whole-array blocks: B >= ~200 at N=2048 exceeds the default 16 MB
        # scoped-VMEM limit (measured OOM at B=256); v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xyz_t)
    return lax.stop_gradient(idx)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas_with_coords(
    xyz: jnp.ndarray, npoint: int, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS returning BOTH indices and the selected coordinates.

    [B, N, 3] -> (idx int32 [B, npoint], new_xyz f32 [B, npoint, 3]).

    The coordinates come straight out of the kernel's per-step extraction
    (bit-identical to ``gather_point(xyz, idx)``), saving the caller the
    post-hoc gather — the vmap row gather costs ~1.3 ms at B=128 2048→512
    (row-rate-limited), while the in-kernel lane-select accumulation rides
    the latency-bound selection chain.  Both outputs are stop_gradient'ed
    (FPS has no gradient; the reference's new_xyz gather IS differentiable,
    so the TRAINING paths keep gather_point — this entry point is for
    inference/eval chains)."""
    b, n, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    kernel = functools.partial(_fps_kernel, npoint=npoint, with_coords=True)
    idx, cx, cy, cz = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, npoint), jnp.int32),
            jax.ShapeDtypeStruct((b, npoint), jnp.float32),
            jax.ShapeDtypeStruct((b, npoint), jnp.float32),
            jax.ShapeDtypeStruct((b, npoint), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, n), jnp.float32),
            pltpu.VMEM((npoint, b), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xyz_t)
    # Return coords in xyz.dtype (the gather_point contract on both
    # dispatch paths); the selection state is f32, so the round-trip is
    # exact for any input dtype that widens losslessly to f32.
    new_xyz = jnp.stack([cx, cy, cz], axis=-1).astype(xyz.dtype)
    return lax.stop_gradient(idx), lax.stop_gradient(new_xyz)
