"""Pure-JAX batch augmentations with keyed RNG.

The reference does all augmentation on host with global numpy RNG, per-cloud
python loops, then feed_dicts the result (/root/reference/pointnet2/utils/provider.py:10-236,
/root/reference/3DmFV-Net/provider.py:55-211).  Here every transform is a
jit-able, vmap-free batched function ``f(key, points, ...) -> points`` that
runs on device, so augmentation fuses into the train step and never touches
host memory.  Distributional semantics (angle ranges, sigmas, clips) match the
reference exactly.

All functions take ``points`` of shape [B, N, 3] (float) and a jax PRNG key.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

# Rotations are 3x3 matmuls - bandwidth-bound, no MXU benefit from bf16, and
# the default TPU bf16 matmul precision would add ~0.4% coordinate noise to
# the deterministic voting-eval rotations. Always run them at full precision.
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "rotation_matrix_y",
    "rotate_point_cloud",
    "rotate_point_cloud_z",
    "rotate_point_cloud_by_angle",
    "rotate_perturbation_point_cloud",
    "jitter_point_cloud",
    "shift_point_cloud",
    "random_scale_point_cloud",
    "scale_point_cloud_anisotropic",
    "translate_point_cloud",
    "random_point_dropout",
    "shuffle_points",
    "insert_outliers_to_point_cloud",
    "occlude_point_cloud",
    "compose",
]


def rotation_matrix_y(angle: jnp.ndarray) -> jnp.ndarray:
    """Per-angle rotation matrix about the up (y) axis, matching the row-vector
    convention ``pc @ R`` of provider.rotate_point_cloud (provider.py:34-52).

    ``angle`` may be any shape; output has shape angle.shape + (3, 3).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = jnp.stack(
        [c, z, s,
         z, o, z,
         -s, z, c],
        axis=-1,
    )
    return rows.reshape(angle.shape + (3, 3))


def _rotation_matrix_z(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = jnp.stack([c, s, z, -s, c, z, z, z, o], axis=-1)
    return rows.reshape(angle.shape + (3, 3))


def rotate_point_cloud(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Uniform random rotation about y, one angle per cloud (provider.py:34-52)."""
    angles = jax.random.uniform(key, (points.shape[0],)) * 2.0 * jnp.pi
    return jnp.einsum("bnc,bcd->bnd", points, rotation_matrix_y(angles), precision=_HI)


def rotate_point_cloud_z(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """Uniform random rotation about z (provider.py:54-72)."""
    angles = jax.random.uniform(key, (points.shape[0],)) * 2.0 * jnp.pi
    return jnp.einsum("bnc,bcd->bnd", points, _rotation_matrix_z(angles), precision=_HI)


def rotate_point_cloud_by_angle(points: jnp.ndarray, angle) -> jnp.ndarray:
    """Deterministic y-rotation of every cloud by ``angle`` — the voting-eval
    transform (provider.py:123-141). Fully fusable into the eval step.

    When ``angle`` is a concrete host value (the voting loop's case), cos/sin
    are evaluated on host in float64 — TPU f32 transcendentals lose ~1e-3 at
    arguments near 2π, which would perturb voting parity with the reference's
    numpy implementation.
    """
    import numpy as np

    if isinstance(angle, (int, float)) or (
        isinstance(angle, np.ndarray) and angle.ndim == 0
    ):
        c, s = np.cos(float(angle)), np.sin(float(angle))
        rot = jnp.asarray(
            [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], dtype=points.dtype
        )
    else:
        rot = rotation_matrix_y(jnp.asarray(angle, dtype=points.dtype))
    return jnp.einsum("bnc,cd->bnd", points, rot, precision=_HI)


def rotate_perturbation_point_cloud(
    key: jax.Array, points: jnp.ndarray, angle_sigma: float = 0.06, angle_clip: float = 0.18
) -> jnp.ndarray:
    """Small random Rz·Ry·Rx perturbation per cloud (provider.py:167-190)."""
    b = points.shape[0]
    angles = jnp.clip(angle_sigma * jax.random.normal(key, (b, 3)), -angle_clip, angle_clip)
    ax, ay, az = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    z = jnp.zeros_like(cx)
    o = jnp.ones_like(cx)
    rx = jnp.stack([o, z, z, z, cx, -sx, z, sx, cx], axis=-1).reshape(b, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], axis=-1).reshape(b, 3, 3)
    rz = jnp.stack([cz, -sz, z, sz, cz, z, z, z, o], axis=-1).reshape(b, 3, 3)
    rot = jnp.einsum("bij,bjk,bkl->bil", rz, ry, rx)
    return jnp.einsum("bnc,bcd->bnd", points, rot, precision=_HI)


def jitter_point_cloud(
    key: jax.Array, points: jnp.ndarray, sigma: float = 0.01, clip: float = 0.05
) -> jnp.ndarray:
    """Per-point clipped gaussian jitter (provider.py:192-204)."""
    noise = jnp.clip(sigma * jax.random.normal(key, points.shape, points.dtype), -clip, clip)
    return points + noise


def shift_point_cloud(
    key: jax.Array, points: jnp.ndarray, shift_range: float = 0.1
) -> jnp.ndarray:
    """Per-cloud uniform translation (provider.py:206-218)."""
    shifts = jax.random.uniform(
        key, (points.shape[0], 1, 3), points.dtype, -shift_range, shift_range
    )
    return points + shifts


def random_scale_point_cloud(
    key: jax.Array, points: jnp.ndarray, scale_low: float = 0.8, scale_high: float = 1.25
) -> jnp.ndarray:
    """Per-cloud isotropic scaling (provider.py:221-233)."""
    scales = jax.random.uniform(key, (points.shape[0], 1, 1), points.dtype, scale_low, scale_high)
    return points * scales


def scale_point_cloud_anisotropic(
    key: jax.Array, points: jnp.ndarray, smin: float = 0.66, smax: float = 1.5
) -> jnp.ndarray:
    """Per-cloud per-axis scaling (3DmFV-Net/provider.py scale_point_cloud)."""
    scales = jax.random.uniform(key, (points.shape[0], 1, 3), points.dtype, smin, smax)
    return points * scales


def translate_point_cloud(
    key: jax.Array, points: jnp.ndarray, tval: float = 0.2
) -> jnp.ndarray:
    """Per-cloud uniform translation in [-tval, tval] (3DmFV-Net/provider.py)."""
    t = jax.random.uniform(key, (points.shape[0], 1, 3), points.dtype, -tval, tval)
    return points + t


def random_point_dropout(
    key: jax.Array, points: jnp.ndarray, max_dropout_ratio: float = 0.875
) -> jnp.ndarray:
    """Replace a random fraction of points with each cloud's FIRST point
    (provider.py:236-244 sets dropped points to point 0)."""
    kb, kp = jax.random.split(key)
    ratio = jax.random.uniform(kb, (points.shape[0], 1)) * max_dropout_ratio
    u = jax.random.uniform(kp, points.shape[:2])
    drop = u <= ratio  # [B, N]
    first = points[:, :1, :]
    return jnp.where(drop[..., None], first, points)


def shuffle_points(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """One shared point permutation for the whole batch — "changes FPS
    behavior" (provider.py:22-32)."""
    perm = jax.random.permutation(key, points.shape[1])
    return points[:, perm, :]


def insert_outliers_to_point_cloud(
    key: jax.Array, points: jnp.ndarray, outlier_ratio: float = 0.05
) -> jnp.ndarray:
    """Replace a random subset of points with uniform noise in the unit cube
    (3DmFV-Net/provider.py insert_outliers_to_point_cloud)."""
    kb, kn = jax.random.split(key)
    u = jax.random.uniform(kb, points.shape[:2])
    outlier = u < outlier_ratio
    noise = jax.random.uniform(kn, points.shape, points.dtype, -1.0, 1.0)
    return jnp.where(outlier[..., None], noise, points)


def occlude_point_cloud(
    key: jax.Array, points: jnp.ndarray, occlusion_ratio: float = 0.25
) -> jnp.ndarray:
    """Occlusion: pick a random pivot per cloud and collapse its nearest
    ``occlusion_ratio`` fraction of points onto the batch's surviving points
    (3DmFV-Net/provider.py occlude_point_cloud removes nearest-to-pivot points;
    with static shapes we re-assign occluded points to the pivot-farthest
    point instead of shrinking N)."""
    b, n, _ = points.shape
    kp = jax.random.randint(key, (b,), 0, n)
    pivot = jnp.take_along_axis(points, kp[:, None, None].repeat(3, -1), axis=1)  # [B,1,3]
    d = jnp.sum((points - pivot) ** 2, axis=-1)  # [B, N]
    k = int(n * occlusion_ratio)
    if k == 0:
        return points
    thresh = -jax.lax.top_k(-d, k)[0][:, -1:]  # k-th smallest distance
    occluded = d <= thresh
    far_idx = jnp.argmax(d, axis=1)  # farthest surviving point
    far = jnp.take_along_axis(points, far_idx[:, None, None].repeat(3, -1), axis=1)
    return jnp.where(occluded[..., None], far, points)


def compose(*fns: Callable) -> Callable:
    """Chain keyed transforms: each fn is f(key, pts) -> pts."""

    def apply(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
        keys = jax.random.split(key, len(fns))
        for k, fn in zip(keys, fns):
            points = fn(k, points)
        return points

    return apply


def standard_train_augment(key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
    """The reference classification-train recipe: rotate about y then jitter
    (/root/reference/pointnet2/train.py:246-247)."""
    k1, k2 = jax.random.split(key)
    return jitter_point_cloud(k2, rotate_point_cloud(k1, points))


def pointcnn_xforms(
    key: jax.Array,
    num: int,
    rotation_range: Sequence = (0.0, jnp.pi, 0.0, "u"),
    scaling_range: Sequence = (0.1, 0.1, 0.1, "g"),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cloud augmentation transforms for PointCNN, matching
    pointfly.get_xforms (PointCNN/pointfly.py:75-92): per-axis rotation
    angles (uniform in ±bound, or gaussian clipped at 3σ) composed
    intrinsically x→y→z, and per-axis scaling (gaussian around 1 clipped at
    3σ, or uniform 1±bound).

    Returns (xforms[num,3,3], rotations[num,3,3]).

    Documented deviation: the reference computes ``scaling * rotation`` with
    numpy's ELEMENTWISE ``*`` on a diag matrix, which zeroes all off-diagonal
    rotation terms and degenerates the augmentation to axis scaling/flips.
    We use the intended matrix product S @ R.
    """
    k_rot, k_scale = jax.random.split(key)
    rot_keys = jax.random.split(k_rot, 3)
    angles = []
    for i in range(3):
        bound, method = float(rotation_range[i]), rotation_range[3]
        if method == "g":
            a = jnp.clip(
                bound * jax.random.normal(rot_keys[i], (num,)), -3 * bound, 3 * bound
            )
        else:
            a = bound * jax.random.uniform(rot_keys[i], (num,), minval=-1.0, maxval=1.0)
        angles.append(a)
    ax, ay, az = angles
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    z = jnp.zeros_like(cx)
    o = jnp.ones_like(cx)
    rx = jnp.stack([o, z, z, z, cx, -sx, z, sx, cx], -1).reshape(num, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(num, 3, 3)
    rz = jnp.stack([cz, -sz, z, sz, cz, z, z, z, o], -1).reshape(num, 3, 3)
    rotations = jnp.einsum("bij,bjk,bkl->bil", rx, ry, rz)

    scale_keys = jax.random.split(k_scale, 3)
    scales = []
    for i in range(3):
        bound, method = float(scaling_range[i]), scaling_range[3]
        if method == "g":
            s = 1.0 + jnp.clip(
                bound * jax.random.normal(scale_keys[i], (num,)), -3 * bound, 3 * bound
            )
        else:
            s = 1.0 + bound * jax.random.uniform(
                scale_keys[i], (num,), minval=-1.0, maxval=1.0
            )
        scales.append(s)
    scaling = jnp.zeros((num, 3, 3)).at[:, 0, 0].set(scales[0])
    scaling = scaling.at[:, 1, 1].set(scales[1]).at[:, 2, 2].set(scales[2])
    xforms = jnp.einsum("bij,bjk->bik", scaling, rotations)
    return xforms, rotations


def pointcnn_augment(
    key: jax.Array,
    points: jnp.ndarray,
    jitter_range: float = 0.0,
    rotation_range: Sequence = (0.0, jnp.pi, 0.0, "u"),
    scaling_range: Sequence = (0.1, 0.1, 0.1, "g"),
) -> jnp.ndarray:
    """In-graph PointCNN augmentation (pointfly.augment, pointfly.py:94-103):
    per-cloud transform matmul + gaussian jitter clipped at ±5·range."""
    k_x, k_j = jax.random.split(key)
    xforms, _ = pointcnn_xforms(k_x, points.shape[0], rotation_range, scaling_range)
    out = jnp.einsum("bnc,bcd->bnd", points, xforms.astype(points.dtype), precision=_HI)
    if jitter_range:
        noise = jnp.clip(
            jitter_range * jax.random.normal(k_j, out.shape, out.dtype),
            -5 * jitter_range, 5 * jitter_range,
        )
        out = out + noise
    return out


def starve_gaussians(
    key: jax.Array,
    points: jnp.ndarray,
    gmm_means: jnp.ndarray,
    n_points: int,
    starve_coef: float = 0.6,
) -> jnp.ndarray:
    """Subsample with region-specific sparsity (3DmFV-Net/provider.py:182-211):
    each point's survival score is a uniform draw scaled by its nearest
    gaussian's coefficient (1 or ``starve_coef``, chosen at random per
    gaussian); the top ``n_points`` scores survive.

    Args:
      points: [B, N, 3]; gmm_means: [G, 3]; returns [B, n_points, 3].
    """
    b, n, _ = points.shape
    g = gmm_means.shape[0]
    k_sk, k_rx = jax.random.split(key)
    d = jnp.sum(
        jnp.square(points[:, :, None, :] - gmm_means[None, None]), axis=-1
    )  # [B, N, G]
    nearest = jnp.argmin(d, axis=2)  # [B, N]
    sk = jnp.where(
        jax.random.bernoulli(k_sk, 0.5, (g,)), 1.0, starve_coef
    ).astype(points.dtype)
    p = sk[nearest] * jax.random.uniform(k_rx, (b, n), points.dtype)
    _, top_idx = jax.lax.top_k(p, n_points)  # [B, n_points]
    from scanobjectnn_tpu.ops.grouping import batched_index_gather

    return batched_index_gather(points, top_idx)
