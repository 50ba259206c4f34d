"""X-Conv: PointCNN's learned-transform point convolution, plus its geometry
helpers (unique-kNN, point sorting, inverse-density sampling).

Behavioral references:
  * PointCNN/pointcnn.py:10-52 (xconv): dilated unique-kNN → lifted point
    features (2 ELU+BN denses) → learned K×K X-transform (one conv + two
    depthwise convs over the K window) matmul'd with the features →
    separable conv to C channels → optional global-position features.
  * PointCNN/pointfly.py:122-146 (batch_distance_matrix_general +
    py_func duplicate-column masking — reimplemented in-graph),
    :163-177 (knn_indices_general), :179-217 (sort_points),
    :284-296 (inverse_density_sampling), :298-347 (ELU + glorot-normal +
    BN(0.99) layer wrappers; note the reference order is dense → ELU → BN).

TPU-native notes: all (1,K)-window convolutions are einsums over the K axis
(MXU matmuls); the py_func point-dedup becomes an in-graph exact-equality
mask; PointCNN's dynamic batch dim N=tf.shape(...) becomes static B.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.nn.layers import BatchNorm
from scanobjectnn_tpu.ops.grouping import pairwise_squared_distance
from scanobjectnn_tpu.ops.pallas.edge_kernel import gather_neighbors

__all__ = ["knn_indices_general", "sort_points", "inverse_density_sample", "EluDense", "XConv"]

glorot_normal = nn.initializers.glorot_normal()

# PointCNN's BN is tf.layers.batch_normalization(momentum=0.99)
# (pointfly.py:299-303) — fixed, NOT the scheduled bn_decay.
_PCNN_BN_MOMENTUM = 0.99


def _duplicate_mask(points: jnp.ndarray) -> jnp.ndarray:
    """[B, N] bool: point j is an exact duplicate of some earlier point i<j
    (pointfly.py:131-146 does this via a numpy py_func; here a strictly-
    lower-triangular exact-equality test does it in-graph)."""
    n = points.shape[1]
    eq = jnp.all(points[:, :, None, :] == points[:, None, :, :], axis=-1)  # [B,N,N]
    earlier = jnp.tril(jnp.ones((n, n), bool), k=-1)  # earlier[i,j]: i<j? need i<j → use upper? tril(k=-1)[i,j]=1 iff i>j
    # dup[j] = any_{i<j} eq[i,j]  → mask rows i<j: use transpose of tril.
    return jnp.any(eq & earlier.T[None], axis=1)  # [B, N]


def _mask_duplicate_points(d2: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Add max(D) to distance columns of duplicated points so unique points
    win the top-k."""
    dup = _duplicate_mask(points)
    return d2 + jnp.max(d2) * dup[:, None, :].astype(d2.dtype)


def _knn_indices_pallas(queries, points, k: int, unique: bool, interpret: bool = False):
    """The TPU branch of knn_indices_general, factored out so the interpret
    suite can pin the dispatch glue (dup-bias construction, norm bound,
    stop-gradient barriers) off-TPU."""
    from scanobjectnn_tpu.ops.pallas.knn_kernel import (
        duplicate_mask_pallas,
        knn_point_pallas,
    )

    queries_sg = jax.lax.stop_gradient(queries)
    points_sg = jax.lax.stop_gradient(points)
    bias = None
    if unique:
        big = (
            4.0 * jnp.max(jnp.sum(queries_sg * queries_sg, axis=-1))
            + 4.0 * jnp.max(jnp.sum(points_sg * points_sg, axis=-1))
            + 1.0
        )  # > max d2 = max (|q|+|p|)^2
        bias = duplicate_mask_pallas(points_sg, interpret=interpret) * big
    dist, idx = knn_point_pallas(
        queries_sg, points_sg, k, interpret=interpret, bias=bias
    )
    return jax.lax.stop_gradient(dist), idx


def knn_indices_general(
    queries: jnp.ndarray, points: jnp.ndarray, k: int, unique: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points per query with optional duplicate-point suppression
    (pointfly.py:163-177).  Returns (dist[B,P,K], idx[B,P,K]).

    On TPU this dispatches to the blocked Pallas kNN kernel with the
    duplicate mask as a per-key distance bias (lax.top_k over the [B,P,N]
    matrix is the dominant PointCNN cost otherwise — 10.8 ms at B32 N1024
    k8 on v5e vs ~1 ms blocked).  Selected indices and ordering match the
    lax path (the bias constant only needs to exceed the global max d²,
    which any norm bound gives) EXCEPT when suppressed duplicates
    themselves reach the top-k (fewer than k unique points): there the two
    backends add different large constants to nearby d² values and may
    order the duplicate slots differently.  The returned distances of
    suppressed-duplicate slots likewise differ between backends.  Only idx
    is consumed on the XConv path, and slot 0 — the query itself — is
    never a suppressed dup.  Like the other Pallas dispatchers this path
    is NOT differentiable (pallas_call has no autodiff rule); inputs and
    outputs are stop_gradient'ed to keep behavior backend-independent —
    use the lax path for exotic uses needing distance gradients."""
    from scanobjectnn_tpu.ops.fps import _use_pallas

    if (
        _use_pallas()
        and queries.shape[1] % 8 == 0
        # measured crossover: below ~256k distance entries the lax top_k
        # path is already as fast (L3/L4 of the PointCNN pyramid)
        and queries.shape[1] * points.shape[1] >= 256 * 1024
        and k <= 64
    ):
        return _knn_indices_pallas(queries, points, k, unique)

    # stop_gradient here too so the gradient barrier holds on BOTH backends
    # (round-2 ADVICE: only the Pallas branch blocked distance gradients).
    d2 = pairwise_squared_distance(
        jax.lax.stop_gradient(queries), jax.lax.stop_gradient(points)
    )
    if unique:
        d2 = _mask_duplicate_points(d2, jax.lax.stop_gradient(points))
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx.astype(jnp.int32)


def sort_points(points: jnp.ndarray, idx: jnp.ndarray, method: str) -> jnp.ndarray:
    """Reorder each neighborhood for order-dependent convolution
    (pointfly.py:179-217).  method: 'l2' (by distance to the neighborhood
    mean) or 'c<permutation-of-xyz>' (lexicographic with 100^k scaling,
    keeping slot 0 — the query point — first)."""
    b, p, k = idx.shape
    nn_pts = ops.group_point(points, idx)  # [B, P, K, 3]
    if method.startswith("c"):
        if "".join(sorted(method[1:])) != "xyz":
            raise ValueError(f"unknown sorting method {method!r}")
        eps = 1e-8
        mn = jnp.min(nn_pts, axis=2, keepdims=True)
        mx = jnp.max(nn_pts, axis=2, keepdims=True)
        normalized = (nn_pts - mn) / (mx - mn + eps)
        scaling = jnp.asarray(
            [
                math.pow(100.0, 3 - method.find("x")),
                math.pow(100.0, 3 - method.find("y")),
                math.pow(100.0, 3 - method.find("z")),
            ],
            nn_pts.dtype,
        )
        key = jnp.sum(normalized * scaling, axis=-1)  # [B, P, K]
        key = jnp.concatenate(
            [jnp.zeros((b, p, 1), key.dtype), key[:, :, 1:]], axis=-1
        )
    elif method == "l2":
        mean = jnp.mean(nn_pts, axis=2, keepdims=True)
        key = jnp.linalg.norm(nn_pts - mean, axis=-1)  # [B, P, K]
    else:
        raise ValueError(f"unknown sorting method {method!r}")
    order = jnp.argsort(key, axis=-1)
    return jnp.take_along_axis(idx, order, axis=-1)


def inverse_density_sample(
    key: jax.Array, points: jnp.ndarray, k: int, sample_num: int
) -> jnp.ndarray:
    """Sample ``sample_num`` indices per cloud with probability proportional
    to mean kNN distance (pointfly.py:284-296; the reference draws with a
    numpy py_func — here jax.random.categorical)."""
    d2 = pairwise_squared_distance(points, points)
    neg, _ = jax.lax.top_k(-d2, k)
    avg = jnp.abs(jnp.mean(-neg, axis=-1)) + 1e-8  # [B, N]
    logits = jnp.log(avg)
    return jax.random.categorical(
        key, logits[:, None, :], axis=-1, shape=(points.shape[0], sample_num)
    ).astype(jnp.int32)


class EluDense(nn.Module):
    """PointCNN's dense: glorot-normal, no bias, ELU, then BN(0.99)
    (pointfly.py:343-347).  ``with_bn=False`` → plain dense with bias."""

    features: int
    with_bn: bool = True
    activation: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = self.dtype or x.dtype
        kernel = self.param("kernel", glorot_normal, (x.shape[-1], self.features), jnp.float32)
        y = jnp.einsum(
            "...i,io->...o", x.astype(dtype), kernel.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        if not self.with_bn:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        if self.activation:
            y = nn.elu(y)
        if self.with_bn:
            y = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn")(
                y, use_running_average=not train, momentum=_PCNN_BN_MOMENTUM
            )
        return y


class _WindowConv(nn.Module):
    """conv2d with kernel (1, K) over [B, P, K, C] → [B, P, C_out]: one Dense
    over the flattened (K·C) axis, ELU, BN (pointfly.py:333-341)."""

    features: int
    activation: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, p, k, c = x.shape
        dtype = self.dtype or x.dtype
        kernel = self.param("kernel", glorot_normal, (k * c, self.features), jnp.float32)
        y = jnp.einsum(
            "bpi,io->bpo", x.reshape(b, p, k * c).astype(dtype), kernel.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        if self.activation:
            y = nn.elu(y)
        return BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn")(
            y, use_running_average=not train, momentum=_PCNN_BN_MOMENTUM
        )


class _DepthwiseWindowConv(nn.Module):
    """Depthwise conv with kernel (1, K) and channel multiplier M over
    [B, P, K, C] → [B, P, C·M] (channel-major output order, matching TF's
    depthwise layout), optional ELU, then BN (pointfly.py:319-331)."""

    multiplier: int
    activation: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, p, k, c = x.shape
        dtype = self.dtype or x.dtype
        kernel = self.param("kernel", glorot_normal, (k, c, self.multiplier), jnp.float32)
        y = jnp.einsum(
            "bpkc,kcm->bpcm", x.astype(dtype), kernel.astype(dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, p, c * self.multiplier).astype(dtype)
        if self.activation:
            y = nn.elu(y)
        return BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn")(
            y, use_running_average=not train, momentum=_PCNN_BN_MOMENTUM
        )


class _SeparableWindowConv(nn.Module):
    """tf.layers.separable_conv2d with kernel (1, K): depthwise (multiplier
    dm) + pointwise to C, ELU after the pointwise, then BN
    (pointfly.py:306-317)."""

    features: int
    depth_multiplier: int = 1
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, p, k, c = x.shape
        dtype = self.dtype or x.dtype
        dw = self.param("depthwise", glorot_normal, (k, c, self.depth_multiplier), jnp.float32)
        pw = self.param(
            "pointwise", glorot_normal, (c * self.depth_multiplier, self.features), jnp.float32
        )
        y = jnp.einsum(
            "bpkc,kcm->bpcm", x.astype(dtype), dw.astype(dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, p, c * self.depth_multiplier)
        y = jnp.einsum(
            "bpi,io->bpo", y.astype(dtype), pw.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        y = nn.elu(y)
        return BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn")(
            y, use_running_average=not train, momentum=_PCNN_BN_MOMENTUM
        )


class XConv(nn.Module):
    """One X-Conv layer (pointcnn.py:10-52).

    Args at call: pts [B,N,3], fts [B,N,C_prev] or None, qrs [B,P,3].
    Returns [B, P, C (+ C//4 with_global)].
    """

    K: int
    D: int
    C: int
    C_pts_fts: int
    depth_multiplier: int
    with_X_transformation: bool = True
    with_global: bool = False
    sorting_method: str | None = None
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, pts, fts, qrs, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        _, idx_dilated = knn_indices_general(qrs, pts, self.K * self.D, unique=True)
        idx = idx_dilated[:, :, :: self.D]
        if self.sorting_method is not None:
            idx = sort_points(pts, idx, self.sorting_method)

        nn_pts = ops.group_point(pts, idx)  # [B, P, K, 3]
        nn_pts_local = nn_pts - qrs[:, :, None, :]

        h = EluDense(self.C_pts_fts, name="nn_fts_from_pts_0", **kw)(nn_pts_local, train)
        nn_fts_from_pts = EluDense(self.C_pts_fts, name="nn_fts_from_pts", **kw)(h, train)
        if fts is None:
            nn_fts_input = nn_fts_from_pts
        else:
            # Batched one-hot MXU gather on TPU for lane-friendly channel
            # counts / N >= 256 (XLA row gather elsewhere).
            nn_fts_from_prev = gather_neighbors(fts, idx)
            nn_fts_input = jnp.concatenate([nn_fts_from_pts, nn_fts_from_prev], axis=-1)

        if self.with_X_transformation:
            b, p, k = idx.shape
            x0 = _WindowConv(self.K * self.K, name="X_0", **kw)(nn_pts_local, train)
            x0 = x0.reshape(b, p, self.K, self.K)
            x1 = _DepthwiseWindowConv(self.K, name="X_1", **kw)(x0, train)
            x1 = x1.reshape(b, p, self.K, self.K)
            x2 = _DepthwiseWindowConv(self.K, activation=False, name="X_2", **kw)(x1, train)
            x2 = x2.reshape(b, p, self.K, self.K)
            fts_x = jnp.einsum(
                "bpij,bpjc->bpic", x2, nn_fts_input,
                preferred_element_type=jnp.float32,
            ).astype(nn_fts_input.dtype)
        else:
            fts_x = nn_fts_input

        fts_conv = _SeparableWindowConv(
            self.C, depth_multiplier=self.depth_multiplier, name="fts_conv", **kw
        )(fts_x, train)  # [B, P, C]

        if self.with_global:
            g = EluDense(self.C // 4, name="fts_global_0", **kw)(qrs, train)
            g = EluDense(self.C // 4, name="fts_global", **kw)(g, train)
            return jnp.concatenate([g, fts_conv], axis=-1)
        return fts_conv
