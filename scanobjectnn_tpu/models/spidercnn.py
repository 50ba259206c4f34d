"""SpiderCNN: Taylor-polynomial-parameterized point convolutions.

Behavioral references:
  * SpiderCNN/models/spidercnn_cls_xyz.py:20-79 — one kNN (k=20) on xyz,
    4 stacked spiderConvs (32→64→128→256) REUSING the same neighbor idx and
    deltas, concat of all scales, top-2 pooling per channel, FC
    1024→512→15 with dropout keep 0.3 and multi-GPU BN.
  * SpiderCNN/utils/tf_util.py:127-236 — spiderConv: per-edge degree-3
    Taylor family g_d(δ) = Σ_α w_α·δx^a·δy^b·δz^c (20 monomial weights per
    taylor channel), outer product with input features, then a [1,K] conv to
    the output channels.
  * tf_util.py:363-377 — topk_pool: top-k values per channel over points.

TPU-native form: the 20-monomial basis is computed once per edge as a
[B, N, K, 20] tensor; the per-taylor-channel weighting is a Dense(20→T), the
feature outer-product is an einsum, and the [1,K] conv over the neighborhood
is one MXU matmul over the flattened (K·C_in·T) axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.models import losses
from scanobjectnn_tpu.nn.layers import BatchNorm, Dense, default_kernel_init
from scanobjectnn_tpu.ops.pallas.edge_kernel import edge_gather_knn
from scanobjectnn_tpu.ops.pallas.spider_kernel import spider_conv

__all__ = ["SpiderConv", "SpiderCNNCls", "taylor_basis"]


class _DenseParams(nn.Module):
    """Creates the exact parameter tree of ``Dense`` (kernel + bias, same
    initializers) without running its matmul — the fused spiderConv kernel
    consumes the weights directly, and fused/unfused share checkpoints."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", default_kernel_init, (self.in_features, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def taylor_basis(delta: jnp.ndarray) -> jnp.ndarray:
    """All 20 monomials of (x, y, z) up to total degree 3, in the reference's
    grouping order (tf_util.py:216-222: x, y, z, xyz, xy, yz, xz, 1, x², y²,
    z², x²y, xy², x²z, xz², y²z, yz², x³, y³, z³).

    delta: [..., 3] -> [..., 20]
    """
    x, y, z = delta[..., 0], delta[..., 1], delta[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            x, y, z, x * y * z,
            x * y, y * z, x * z, one,
            x * x, y * y, z * z,
            x * x * y, x * y * y, x * x * z,
            x * z * z, y * y * z, y * z * z,
            x * x * x, y * y * y, z * z * z,
        ],
        axis=-1,
    )


class SpiderConv(nn.Module):
    """One spiderConv layer: g_d = Taylor basis · W  (per taylor channel),
    features ⊗ g_d, then a full [1,K] convolution to ``features_out``."""

    features_out: int
    taylor_channels: int = 5
    num_groups: int = 16
    use_gn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    fused: bool = True

    @nn.compact
    def __call__(
        self,
        feat: jnp.ndarray,  # [B, N, C_in]
        idx: jnp.ndarray,  # [B, N, K]
        delta: jnp.ndarray,  # [B, N, K, 3]
        train: bool = False,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        b, n, k = idx.shape
        c_in = feat.shape[-1]

        # g_d: one learned linear combination of the 20 monomials per taylor
        # channel (the reference's 20 separate tiled weight tensors,
        # tf_util.py:180-222, collapse to a single [20, T] matrix; its
        # "biases" weight is the constant monomial).
        basis = taylor_basis(delta.astype(jnp.float32))  # [B, N, K, 20]
        w = self.param(
            "taylor_weights", default_kernel_init, (20, self.taylor_channels), jnp.float32
        )
        dtype = self.dtype or feat.dtype
        kernel, bias = _DenseParams(
            k * c_in * self.taylor_channels, self.features_out, name="conv"
        )()

        if self.fused:
            # Fully-fused Pallas path: gather + outer product + conv matmul
            # in one VMEM-resident program (ops/pallas/spider_kernel.py) —
            # the [B,N,K,C] gather and [B,N,K·C·T] operand never hit HBM.
            g_d = jnp.einsum("bnkm,mt->bnkt", basis, w)  # f32
            out = spider_conv(feat.astype(jnp.float32), idx, g_d, kernel)
            out = (out + bias).astype(dtype)
        else:
            # Direct XLA dataflow (the parity oracle).  The outer product
            # feeds the conv matmul directly; XLA operand-fuses it, so the
            # [B, N, K, C·T] tensor is not materialized.  (Negative results
            # recorded in BENCHMARKS.md: a lax.scan over K pays 2.7 GB of
            # carry dynamic-update-slices, an unrolled per-k loop
            # materializes 20 [B,N,T,O] terms — both SLOWER.)
            grouped = ops.group_point(feat, idx)  # [B, N, K, C_in]
            g_d = jnp.einsum(
                "bnkm,mt->bnkt", basis.astype(dtype), w.astype(dtype),
                preferred_element_type=jnp.float32,
            )  # [B, N, K, T]
            prod = jnp.einsum("bnkc,bnkt->bnkct", grouped.astype(dtype), g_d.astype(dtype))
            prod = prod.reshape(b, n, k * c_in * self.taylor_channels)
            out = jnp.einsum(
                "...i,io->...o", prod, kernel.astype(dtype),
                preferred_element_type=jnp.float32,
            )
            out = (out + bias).astype(dtype)

        if self.use_gn:
            out = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype)(out)
        else:
            out = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name)(
                out, use_running_average=not train, momentum=bn_momentum
            )
        return nn.relu(out)


def topk_pool(feat: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Top-k values per channel over the point axis
    (SpiderCNN/utils/tf_util.py:363-377): [B, N, C] -> [B, C, k].

    k max-extraction rounds instead of lax.top_k's full sort (the sort was
    5% of the SpiderCNN step).  Tie handling matches top_k exactly: each
    round removes only the first occurrence, so duplicate maxima (common —
    relu zeros) are returned k times, and the gather routes gradients to
    the selected positions like top_k's VJP."""
    x = jnp.swapaxes(feat, 1, 2)  # [B, C, N]
    xs = jax.lax.stop_gradient(x)
    n = x.shape[-1]
    col = jnp.arange(n, dtype=jnp.int32)
    idxs = []
    for _ in range(k):
        am = jnp.argmax(xs, axis=-1)  # first occurrence on ties
        idxs.append(am)
        xs = jnp.where(col == am[..., None], -jnp.inf, xs)
    idx = jnp.stack(idxs, axis=-1)  # [B, C, k]
    return jnp.take_along_axis(x, idx, axis=-1)


class SpiderCNNCls(nn.Module):
    """SpiderCNN classifier (spidercnn_cls_xyz.py:20-70)."""

    num_classes: int = 15
    nsample: int = 20
    taylor_channels: int = 5
    num_groups: int = 16
    dropout_keep: float = 0.3
    fused: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        from scanobjectnn_tpu.ops.fps import _use_pallas

        b, n, _ = points.shape
        # One kNN on xyz, reused by every layer (includes self as first hit —
        # the reference's knn_point over identical sets behaves the same).
        # knn_graph == knn_point(k, x, x).idx and dispatches to the Pallas
        # kernel on TPU.
        if self.fused and _use_pallas() and n >= 256 and n % 8 == 0:
            # kNN + xyz gather in ONE kernel (the gathered rows fall out of
            # the extraction rounds' one-hot matmuls for free); xyz padded
            # to 8 lanes so the MXU gather applies.
            pts8 = jnp.pad(points, ((0, 0), (0, 0), (0, 5)))
            grouped_xyz, idx = edge_gather_knn(points, pts8, self.nsample)
            grouped_xyz = grouped_xyz[..., :3]
        else:
            idx = ops.knn_graph(points, self.nsample)
            grouped_xyz = ops.group_point(points, idx)
        delta = grouped_xyz - points[:, :, None, :]  # [B, N, K, 3]

        kw = dict(
            taylor_channels=self.taylor_channels, num_groups=self.num_groups,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, fused=self.fused,
        )
        feat_1 = SpiderConv(32, name="conv1", **kw)(points, idx, delta, train, bn_momentum)
        feat_2 = SpiderConv(64, name="conv2", **kw)(feat_1, idx, delta, train, bn_momentum)
        feat_3 = SpiderConv(128, name="conv3", **kw)(feat_2, idx, delta, train, bn_momentum)
        feat_4 = SpiderConv(256, name="conv4", **kw)(feat_3, idx, delta, train, bn_momentum)

        feat = jnp.concatenate([feat_1, feat_2, feat_3, feat_4], axis=-1)  # [B,N,480]
        pooled = topk_pool(feat, k=2).reshape(b, -1)  # [B, 960]

        h = pooled
        for i, f in enumerate((1024, 512)):
            h = Dense(f, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train, momentum=bn_momentum
            )
            h = nn.relu(h)
            h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        logits = Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)
        return {"logits": logits, "end_points": {}}

    @staticmethod
    def loss(outputs, batch):
        l = losses.softmax_cross_entropy(outputs["logits"], batch["labels"])
        return l, {"loss": l, "classify_loss": l}
