"""Farthest point sampling, point gathering, categorical sampling.

Behavioral reference: /root/reference/pointnet2/tf_ops/sampling/
(`tf_sampling_g.cu:105-170` FPS, `:172-181` gather, `:7-104` prob sample;
wrappers `tf_sampling.py:14-58`).  Semantics kept exactly:

  * FPS is deterministic and always seeds with point index 0
    (tf_sampling_g.cu:115-116), carries a per-point min-squared-distance
    array initialized to 1e38, and each step argmax-selects the point whose
    min distance to the selected set is largest; ties go to the lowest index
    (the CUDA tree reduction prefers the lower lane on ties, and
    ``jnp.argmax`` picks the first occurrence).
  * ``gather_point`` has a scatter-add gradient (tf_sampling_g.cu:183-192);
    here the gather is a ``take_along_axis`` whose autodiff transpose IS a
    scatter-add.
  * FPS itself has no gradient (``NoGradient``, tf_sampling.py:58) — we
    stop_gradient the indices.

TPU notes: FPS is inherently sequential over npoint steps; each step is an
[B, N] elementwise min + argmax, pure VPU work that XLA keeps in
registers/VMEM under ``lax.scan``.  A fused Pallas variant lives in
ops/pallas/fps_kernel.py and is dispatched for large N.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "farthest_point_sample",
    "farthest_point_sample_lax",
    "farthest_point_sample_with_coords",
    "gather_point",
    "prob_sample",
    "prob_sample_pdf",
]

# Backend dispatch: 'auto' uses the Pallas kernel on TPU and lax elsewhere.
# Configured via kernelconfig (TrainerConfig/CLI); the
# SCANOBJECTNN_OPS_BACKEND env var remains an explicit override.


def set_ops_backend(backend: str) -> None:
    from scanobjectnn_tpu import kernelconfig

    kernelconfig.set_kernel_config(ops_backend=backend)


def _use_pallas() -> bool:
    from scanobjectnn_tpu import kernelconfig

    backend = kernelconfig.ops_backend()
    if backend == "lax":
        return False
    if backend == "pallas":
        return True
    return jax.default_backend() == "tpu"


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative farthest point sampling: [B, N, 3] -> int32 [B, npoint].

    Dispatches to the fused Pallas kernel on TPU (ops/pallas/fps_kernel.py),
    lax.scan elsewhere; identical semantics (parity-tested)."""
    if _use_pallas():
        from scanobjectnn_tpu.ops.pallas.fps_kernel import fps_pallas

        return fps_pallas(xyz, npoint)
    return farthest_point_sample_lax(xyz, npoint)


@partial(jax.jit, static_argnums=1)
def farthest_point_sample_lax(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """lax.scan reference implementation of FPS.

    Args:
      xyz: [B, N, 3] point coordinates.
      npoint: number of points to select (static).

    Returns:
      idx: [B, npoint] int32 indices into N.
    """
    if npoint < 1:
        raise ValueError("npoint must be >= 1")
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def step(carry, _):
        min_dist, last = carry  # [B, N], [B]
        p = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [B, 1, 3]
        d = jnp.sum(jnp.square(xyz - p), axis=-1)  # [B, N]
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=1).astype(jnp.int32)  # first max on ties
        return (min_dist, nxt), nxt

    init = (jnp.full((b, n), 1e38, jnp.float32), jnp.zeros((b,), jnp.int32))
    if npoint == 1:
        idx = jnp.zeros((b, 1), jnp.int32)
    else:
        (_, _), rest = lax.scan(step, init, None, length=npoint - 1)
        idx = jnp.concatenate([jnp.zeros((b, 1), jnp.int32), rest.T], axis=1)
    return lax.stop_gradient(idx)


def farthest_point_sample_with_coords(
    xyz: jnp.ndarray, npoint: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS returning (idx [B, npoint], new_xyz [B, npoint, 3]) in one pass.

    ``new_xyz`` is bit-identical to ``gather_point(xyz, idx)`` but comes
    straight from the Pallas kernel's selection state (saves the ~1.3 ms
    row gather at B=128 eval shapes).  BOTH outputs are stop_gradient'ed —
    use in inference/eval chains; training paths that need the
    differentiable centroid gather keep ``gather_point``."""
    if _use_pallas():
        from scanobjectnn_tpu.ops.pallas.fps_kernel import fps_pallas_with_coords

        return fps_pallas_with_coords(xyz, npoint)
    idx = farthest_point_sample_lax(xyz, npoint)
    return idx, lax.stop_gradient(gather_point(xyz, idx))


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather selected points: [B, N, C], [B, M] -> [B, M, C].

    Differentiable in ``points``; the VJP is a scatter-add, matching
    GatherPointGrad (tf_sampling_g.cu:183-192, tf_sampling.py:44-48).
    """
    from scanobjectnn_tpu.ops.grouping import batched_index_gather

    return batched_index_gather(points, idx)


def prob_sample(cumprob: jnp.ndarray, uniforms: jnp.ndarray) -> jnp.ndarray:
    """Weighted categorical sampling by binary search into a CDF.

    Args:
      cumprob: [B, N] inclusive cumulative probabilities (last entry ~1).
      uniforms: [B, M] uniform samples in [0, 1).

    Returns:
      idx: [B, M] int32 sampled category per draw.

    Reference: ProbSample = block cumsum + binary search
    (tf_sampling_g.cu:7-104, tf_sampling.py:14-23; the wrapper takes the
    *unnormalized* pdf and cumsums on device — callers here pass the CDF,
    use ``jnp.cumsum`` beforehand).
    """
    find = jax.vmap(lambda cdf, u: jnp.searchsorted(cdf, u, side="left"))
    idx = find(cumprob, uniforms)
    return jnp.minimum(idx, cumprob.shape[-1] - 1).astype(jnp.int32)


def prob_sample_pdf(pdf: jnp.ndarray, uniforms: jnp.ndarray) -> jnp.ndarray:
    """Reference-shaped adapter: takes the *unnormalized* pdf and cumsums on
    device before the binary search, exactly like the ProbSample wrapper
    (tf_sampling.py:14-23 feeds the raw pdf; the kernel's block scan is the
    cumsum, tf_sampling_g.cu:7-104).  ``uniforms`` are draws in [0, 1) scaled
    by the total mass.

    Args:
      pdf: [B, N] nonnegative unnormalized weights.
      uniforms: [B, M] uniform samples in [0, 1).

    Returns:
      idx: [B, M] int32 sampled category per draw.
    """
    cdf = jnp.cumsum(pdf.astype(jnp.float32), axis=-1)
    return prob_sample(cdf, uniforms * cdf[..., -1:])
