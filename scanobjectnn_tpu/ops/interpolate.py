"""Three-nearest-neighbor inverse-distance interpolation (the FP decoder's
upsampling primitive).

Behavioral reference: /root/reference/pointnet2/tf_ops/3d_interpolation/
(`tf_interpolate.cpp:57-80` three_nn, `:82-130` three_interpolate + gradient
`:222-262`; wrappers `tf_interpolate.py:9-35`).  Note the reference registers
these as **CPU kernels**, so in TF the FP decoder silently round-trips
device→host→device mid-graph (SURVEY.md §3.2).  Here everything stays fused
on-device.

Semantics preserved: distances are SQUARED euclidean (the CPU kernel stores
``d = Σ(Δ)²`` without sqrt); callers floor them at 1e-10 before inverting
(pointnet_util.py:211-214).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from scanobjectnn_tpu.ops.grouping import pairwise_squared_distance

__all__ = ["three_nn", "three_interpolate", "three_interpolate_weights"]


def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each of the N query points in ``xyz1`` [B, N, 3], the squared
    distances and indices of its 3 nearest points in ``xyz2`` [B, M, 3].

    Returns ``(dist[B, N, 3], idx[B, N, 3])``, ascending by distance.
    """
    m = xyz2.shape[1]
    if m >= 512 and xyz1.shape[1] % 8 == 0:
        from scanobjectnn_tpu.ops.fps import _use_pallas

        if _use_pallas():
            from scanobjectnn_tpu.ops.pallas.knn_kernel import knn_point_pallas

            dist, idx = knn_point_pallas(
                lax.stop_gradient(xyz1), lax.stop_gradient(xyz2), 3
            )
            return lax.stop_gradient(dist), lax.stop_gradient(idx)
    d2 = pairwise_squared_distance(xyz1, xyz2)  # [B, N, M]
    if m >= 3:
        neg_vals, idx = lax.top_k(-d2, 3)
        dist, idx = -neg_vals, idx.astype(jnp.int32)
    else:
        # Fewer than 3 candidates (e.g. interpolating from the group-all
        # level's single point, pointnet2_cls_bga.py:56): the reference CPU
        # kernel leaves unfilled slots at their 1e40 init with index 0
        # (tf_interpolate.cpp:59-66), which zeroes their IDW weight.
        neg_vals, idx = lax.top_k(-d2, m)
        pad = 3 - m
        dist = jnp.concatenate(
            [-neg_vals, jnp.full(d2.shape[:-1] + (pad,), 1e40, d2.dtype)], axis=-1
        )
        idx = jnp.concatenate(
            [idx, jnp.zeros(d2.shape[:-1] + (pad,), idx.dtype)], axis=-1
        ).astype(jnp.int32)
    return lax.stop_gradient(dist), lax.stop_gradient(idx)


def three_interpolate_weights(dist: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weights from squared 3-NN distances, with the
    reference's 1e-10 floor (pointnet_util.py:211-214)."""
    dist = jnp.maximum(dist, 1e-10)
    inv = 1.0 / dist
    return inv / jnp.sum(inv, axis=-1, keepdims=True)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted 3-point feature interpolation.

    Args:
      points: [B, M, C] features at the sparse point set.
      idx: [B, N, 3] int32 indices into M.
      weight: [B, N, 3] interpolation weights.

    Returns:
      [B, N, C] interpolated features.  Differentiable in ``points`` and
      ``weight`` (the points-VJP is the reference's scatter-add
      ThreeInterpolateGrad, tf_interpolate.cpp:222-262).
    """
    from scanobjectnn_tpu.ops.grouping import batched_index_gather

    gathered = batched_index_gather(points, idx)  # [B, N, 3, C]
    return jnp.einsum("bnkc,bnk->bnc", gathered, weight.astype(gathered.dtype))
