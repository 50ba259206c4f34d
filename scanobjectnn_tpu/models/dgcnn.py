"""Dynamic Graph CNN (DGCNN) and its BGA variant.

Behavioral references:
  * dgcnn/models/dgcnn.py:24-111 (EdgeConv trunk 64,64,64,128 → 1024 agg →
    FC head, label-smoothed CE 0.2)
  * dgcnn/models/dgcnn_bga.py:27-153 (shared trunk; class-vector + global-max
    + per-layer features concatenated into the seg branch)
  * dgcnn/models/transform_nets.py:10-55 (edge-feature input transform)
  * dgcnn/utils/tf_util.py:638-717 (pairwise_distance / knn / get_edge_feature)

The kNN graph is recomputed per layer FROM FEATURE SPACE and includes the
self-edge (top_k of the negated dense distance matrix).  Edge feature =
concat(x_i, x_j − x_i).

TPU notes: the N×N pairwise distance matrix is the memory-critical piece
(SURVEY.md §5); `ops.knn_graph` phrases it as one MXU matmul + fused top-k,
and the blocked Pallas variant keeps tiles in VMEM for large N.  Note the
reference's dgcnn_bga.py:27 has a latent NameError in its default num_class
argument (SURVEY.md §2.3) — not replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.models import losses
from scanobjectnn_tpu.nn.layers import BatchNorm, Dense, MLP
from scanobjectnn_tpu.ops.pallas.edge_kernel import (
    edge_gather_knn,
    edge_reduce,
    gather_neighbors,
)

__all__ = ["DGCNN", "DGCNNBGA", "edge_feature"]


def edge_feature(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """EdgeConv input: [B, N, C] -> [B, N, k, 2C] of
    concat(x_i, x_j - x_i) over the feature-space kNN graph (self included)."""
    idx = ops.knn_graph(x, k)  # [B, N, k]
    neighbors = ops.group_point(x, idx)  # [B, N, k, C]
    central = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([central, neighbors - central], axis=-1)


class _PairBN(nn.Module):
    """BatchNorm over the (never materialized) edge population, applied to
    the max-selected pre-activation.

    For edges e_ij = A_i + B_j, batch statistics over all B·N·k edges are
    reconstructed from neighbor sums: Σe = k·ΣA + ΣS and Σe² = Σ(k·A² +
    2·A·S + Q) with S_i = Σ_j B_j, Q_i = Σ_j B_j².  Per channel,
    max_j relu(bn(e_ij)) = relu(bn(A_i + M_i)) with M = max_j B_j when
    γ ≥ 0 and min_j B_j otherwise (bn∘relu is monotone per channel).
    Same semantics (eps, running-stat EMA, call-time momentum, axis_name
    psum) as nn.layers.BatchNorm."""

    k: int
    epsilon: float = 1e-3
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, a, red, use_running_average: bool, momentum=0.9):
        features = a.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        af = a.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            count = af.shape[0] * af.shape[1] * self.k
            mean = (self.k * jnp.sum(af, axis=(0, 1)) + jnp.sum(red["s"], axis=(0, 1))) / count
            mean2 = (
                jnp.sum(self.k * jnp.square(af) + 2.0 * af * red["s"] + red["q2"], axis=(0, 1))
                / count
            )
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        m_sel = jnp.where(scale >= 0, red["mmax"], red["mmin"])
        y = (af + m_sel - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or a.dtype)


class _FusedEdgeMLP(nn.Module):
    """Dense+BN+ReLU+max-over-k without materializing edge tensors.

    Parameter tree is IDENTICAL to ``MLP((features,))`` (dense_0 + bn_0), so
    fused and unfused EdgeConv share checkpoints; outputs match to float
    tolerance (parity-tested)."""

    features: int
    k: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, bn_momentum) -> jnp.ndarray:
        dense = Dense(self.features, dtype=self.dtype, name="dense_0")
        zeros = jnp.zeros_like(x)
        # W = [W1; W2] acting on concat(x_i, x_j−x_i):
        #   c1 = x@W1 + b,  c2 = x@W2 + b  →  e_ij = (c1−c2)_i + (c2)_j.
        c1 = dense(jnp.concatenate([x, zeros], axis=-1))
        c2 = dense(jnp.concatenate([zeros, x], axis=-1))
        a = c1 - c2
        red = edge_reduce(x, c2, self.k)
        y = _PairBN(
            k=self.k, dtype=self.dtype, axis_name=self.bn_axis_name, name="bn_0"
        )(a, red, use_running_average=not train, momentum=bn_momentum)
        return nn.relu(y)


class EdgeConv(nn.Module):
    """One EdgeConv block: edge features → Dense+BN+ReLU → max over k.

    ``fused=True`` (default) computes the identical function without ever
    materializing the [B, N, k, 2C] edge tensors (see _FusedEdgeMLP /
    ops.pallas.edge_kernel) — 3-4× faster training on v5e; ``fused=False``
    is the direct transcription of the reference dataflow, kept as the
    parity oracle."""

    features: int
    k: int = 20
    fused: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, bn_momentum) -> jnp.ndarray:
        if self.fused:
            return _FusedEdgeMLP(
                features=self.features, k=self.k, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name="mlp",
            )(x, train, bn_momentum)
        e = edge_feature(x, self.k)
        e = MLP((self.features,), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="mlp")(e, train=train, bn_momentum=bn_momentum)
        return jnp.max(e, axis=2)


class _TnetEdgeMLP(nn.Module):
    """EdgeTransformNet's per-edge MLP(64, 128) with the first layer in A+B
    form: the [B,N,k,6] edge tensor is never gathered — XLA's C=3 row
    gather + concat costs 20 ms fwd+bwd at B32/N1024/k20 on v5e
    (row-rate-limited).  Dense(6→64) on concat(x_i, x_j−x_i) equals
    (c1−c2)_i + (c2)_j with c1 = dense(x‖0), c2 = dense(0‖x); the neighbor
    rows of c2 are gathered at C=64 by the MXU one-hot kernel.  Layer 2
    (which needs per-edge inputs) runs on the [B,N,k,64] tensor with the
    ORIGINAL BN/relu semantics.  Parameter tree identical to
    ``MLP((64, 128))``."""

    k: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool, bn_momentum) -> jnp.ndarray:
        dense0 = Dense(64, dtype=self.dtype, name="dense_0")
        zeros = jnp.zeros_like(points)
        c1 = dense0(jnp.concatenate([points, zeros], axis=-1))
        c2 = dense0(jnp.concatenate([zeros, points], axis=-1))
        a = c1 - c2
        from scanobjectnn_tpu.ops.fps import _use_pallas

        if _use_pallas() and points.shape[1] >= 256 and points.shape[1] % 8 == 0:
            # kNN + gather in ONE kernel: the gathered rows fall out of the
            # extraction rounds' one-hot matmuls for free.
            bj, _ = edge_gather_knn(jax.lax.stop_gradient(points), c2, self.k)
        else:
            idx = ops.knn_graph(points, self.k)
            bj = gather_neighbors(c2, idx)  # [B, N, k, 64]
        e1 = a[:, :, None, :] + bj
        e1 = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn_0")(
            e1, use_running_average=not train, momentum=bn_momentum
        )
        e1 = nn.relu(e1)
        e1 = Dense(128, dtype=self.dtype, name="dense_1")(e1)
        e1 = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn_1")(
            e1, use_running_average=not train, momentum=bn_momentum
        )
        return nn.relu(e1)


class EdgeTransformNet(nn.Module):
    """DGCNN's input transform operating on edge features
    (transform_nets.py:10-55): conv 64,128 → max over k → conv 1024 → max
    over N → fc 512,256 → 3x3 (identity init)."""

    k: int = 20
    fused: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool, bn_momentum) -> jnp.ndarray:
        if self.fused:
            e = _TnetEdgeMLP(
                k=self.k, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="mlp1",
            )(points, train, bn_momentum)
        else:
            e = edge_feature(points, self.k)  # [B, N, k, 6]
            e = MLP((64, 128), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                    name="mlp1")(e, train=train, bn_momentum=bn_momentum)
        e = jnp.max(e, axis=2)  # [B, N, 128]
        e = MLP((1024,), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="mlp2")(e, train=train, bn_momentum=bn_momentum)
        h = jnp.max(e, axis=1)  # [B, 1024]
        h = MLP((512, 256), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="fc")(h, train=train, bn_momentum=bn_momentum)
        out = Dense(9, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                    name="transform")(h)
        eye = jnp.eye(3, dtype=out.dtype).flatten()
        return (out + eye).reshape(points.shape[0], 3, 3)


class _DGCNNTrunk(nn.Module):
    """Shared trunk: transform → EdgeConv 64,64,64,128 → concat → Dense 1024.

    Returns (agg[B,N,1024], per-layer features [net1..net4])."""

    k: int = 20
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool, bn_momentum):
        kw = dict(k=self.k, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        t = EdgeTransformNet(name="tnet", **kw)(points, train, bn_momentum)
        x = jnp.einsum("bnc,bcd->bnd", points, t)
        feats = []
        for i, f in enumerate((64, 64, 64, 128)):
            x = EdgeConv(f, name=f"edgeconv{i + 1}", **kw)(x, train, bn_momentum)
            feats.append(x)
        agg = MLP((1024,), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  name="agg")(jnp.concatenate(feats, axis=-1),
                              train=train, bn_momentum=bn_momentum)
        return agg, feats


class DGCNN(nn.Module):
    """DGCNN classifier (dgcnn.py:24-104)."""

    num_classes: int = 15
    k: int = 20
    dropout_keep: float = 0.5
    label_smoothing: float = 0.2
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        agg, _ = _DGCNNTrunk(k=self.k, dtype=self.dtype,
                             bn_axis_name=self.bn_axis_name, name="trunk")(
            points, train, bn_momentum
        )
        h = jnp.max(agg, axis=1)  # [B, 1024]
        for i, f in enumerate((512, 256)):
            h = Dense(f, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train, momentum=bn_momentum
            )
            h = nn.relu(h)
            h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        logits = Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)
        return {"logits": logits, "end_points": {}}

    @staticmethod
    def loss(outputs, batch, smoothing: float = 0.2):
        l = losses.label_smoothed_cross_entropy(outputs["logits"], batch["labels"], smoothing)
        return l, {"loss": l, "classify_loss": l}


class DGCNNBGA(nn.Module):
    """BGA DGCNN (dgcnn_bga.py:27-139): class branch produces a 256-d class
    vector; seg branch consumes concat(tiled class vector, tiled global max
    of agg, net1..net4) → 512, 256 → 2-way mask (dropout keep 0.7)."""

    num_classes: int = 15
    seg_classes: int = 2
    k: int = 20
    dropout_keep: float = 0.5
    seg_dropout_keep: float = 0.7
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        b, n, _ = points.shape
        agg, feats = _DGCNNTrunk(k=self.k, dtype=self.dtype,
                                 bn_axis_name=self.bn_axis_name, name="trunk")(
            points, train, bn_momentum
        )
        global_max = jnp.max(agg, axis=1)  # [B, 1024]

        # Classification branch.
        h = Dense(512, dtype=self.dtype, name="fc1")(global_max)
        h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn1")(
            h, use_running_average=not train, momentum=bn_momentum
        )
        h = nn.relu(h)
        h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        h = Dense(256, dtype=self.dtype, name="fc2")(h)
        h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name="bn2")(
            h, use_running_average=not train, momentum=bn_momentum
        )
        h = nn.relu(h)
        class_vector = h  # [B, 256]
        h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        cls_logits = Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)

        # Segmentation branch.
        tiled_cv = jnp.broadcast_to(class_vector[:, None, :], (b, n, 256))
        tiled_gm = jnp.broadcast_to(global_max[:, None, :], (b, n, 1024))
        seg = jnp.concatenate([tiled_cv, tiled_gm] + feats, axis=-1)
        seg = MLP((512, 256), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  name="seg_mlp")(seg, train=train, bn_momentum=bn_momentum)
        seg = nn.Dropout(rate=1.0 - self.seg_dropout_keep, deterministic=not train)(seg)
        seg_logits = Dense(self.seg_classes, dtype=self.dtype, name="seg_out")(seg)

        return {"logits": cls_logits, "seg_logits": seg_logits, "end_points": {}}

    @staticmethod
    def loss(outputs, batch, seg_weight: float = 0.5):
        total, classify, seg = losses.joint_cls_seg_loss(
            outputs["logits"], outputs["seg_logits"],
            batch["labels"], batch["masks"], seg_weight,
        )
        return total, {"loss": total, "classify_loss": classify, "seg_loss": seg}
