"""PointNet model family: vanilla classifier (with T-Nets), basic classifier,
BGA-style joint classification+segmentation, and part segmentation.

Behavioral references:
  * pointnet/models/pointnet_cls.py:21-93 (trunk, head, loss)
  * pointnet/models/transform_nets.py:10-95 (input/feature T-Nets)
  * pointnet/models/pointnet_cls_basic.py:15-60
  * pointnet/models/pointnet_seg.py:24-140 (BGA trunk + dual heads)
  * pointnet/models/pointnet_partseg.py (6-way per-point parts)

TPU-native form: the reference's [1,3]-conv-over-an-image trick becomes a
Dense on xyz; all per-point MLPs are Dense stacks on [B, N, C] (MXU batched
matmuls); global max-pool is a reduce over N.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu.models import losses
from scanobjectnn_tpu.nn.layers import MLP, BatchNorm, Dense

__all__ = ["TransformNet", "PointNetCls", "PointNetSeg", "PointNetPartSeg"]


class TransformNet(nn.Module):
    """Spatial/feature transform network predicting a KxK matrix, initialized
    to the identity (zero weights + identity bias, transform_nets.py:40-53)."""

    k: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, bn_momentum) -> jnp.ndarray:
        b = x.shape[0]
        # final_max_axis: the MLP owns the global max-pool, so bf16 training
        # can keep the pool's tie credit exact (pool_f32/keys modes).
        h = MLP((64, 128, 1024), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                final_max_axis=1, name="mlp")(x, train=train, bn_momentum=bn_momentum)
        h = MLP((512, 256), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="fc")(h, train=train, bn_momentum=bn_momentum)
        out = Dense(
            self.k * self.k,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="transform",
        )(h)
        eye = jnp.eye(self.k, dtype=out.dtype).flatten()
        return (out + eye).reshape(b, self.k, self.k)


class _PointNetTrunk(nn.Module):
    """Shared trunk: [T-Net →] MLP(64,64) [→ feature T-Net] → MLP(64,128,1024)
    → global max.  Returns (point_feat[B,N,64], global_feat[B,1024],
    end_points)."""

    use_tnet: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool, bn_momentum):
        end_points: dict[str, Any] = {}
        x = points
        if self.use_tnet:
            t_in = TransformNet(3, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                name="input_tnet")(x, train, bn_momentum)
            x = jnp.einsum("bnc,bcd->bnd", x, t_in)
        x = MLP((64, 64), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="mlp1")(x, train=train, bn_momentum=bn_momentum)
        if self.use_tnet:
            t_feat = TransformNet(64, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                                  name="feature_tnet")(x, train, bn_momentum)
            end_points["transform"] = t_feat
            x = jnp.einsum("bnc,bcd->bnd", x, t_feat)
        point_feat = x  # [B, N, 64]
        global_feat = MLP(
            (64, 128, 1024), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            final_max_axis=1, name="mlp2",
        )(x, train=train, bn_momentum=bn_momentum)  # [B, 1024]
        return point_feat, global_feat, end_points


class PointNetCls(nn.Module):
    """PointNet classifier; ``use_tnet=False`` gives pointnet_cls_basic."""

    num_classes: int = 15
    use_tnet: bool = True
    dropout_keep: float = 0.7
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        _, global_feat, end_points = _PointNetTrunk(
            use_tnet=self.use_tnet, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            name="trunk",
        )(points, train, bn_momentum)
        h = global_feat
        for i, f in enumerate((512, 256)):
            h = Dense(f, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name=f"fc_bn{i + 1}")(
                h, use_running_average=not train, momentum=bn_momentum
            )
            h = nn.relu(h)
            h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        logits = Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)
        return {"logits": logits, "end_points": end_points}

    @staticmethod
    def loss(outputs, batch, reg_weight: float = 0.001):
        classify = losses.softmax_cross_entropy(outputs["logits"], batch["labels"])
        metrics = {"classify_loss": classify}
        total = classify
        transform = outputs["end_points"].get("transform")
        if transform is not None:
            mat = losses.transform_regularizer(transform)
            metrics["mat_diff_loss"] = mat
            total = total + reg_weight * mat
        metrics["loss"] = total
        return total, metrics


class PointNetSeg(nn.Module):
    """BGA PointNet: class head on the global feature + per-point 2-way
    background/foreground head on concat(point_feat, tiled global_feat)
    (pointnet_seg.py:24-111).  ``seg_classes=2`` is the BGA mask; part-seg
    reuses the same topology with ``seg_classes=num_parts``."""

    num_classes: int = 15
    seg_classes: int = 2
    dropout_keep: float = 0.7
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        n = points.shape[1]
        point_feat, global_feat, end_points = _PointNetTrunk(
            use_tnet=True, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="trunk"
        )(points, train, bn_momentum)

        # Classification branch (fc 512 -> 256 -> num_classes, dropout 0.7).
        h = global_feat
        for i, f in enumerate((512, 256)):
            h = Dense(f, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name=f"fc_bn{i + 1}")(
                h, use_running_average=not train, momentum=bn_momentum
            )
            h = nn.relu(h)
            h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        cls_logits = Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)

        # Segmentation branch on concat(point_feat, tiled global_feat).
        tiled = jnp.broadcast_to(
            global_feat[:, None, :], (points.shape[0], n, global_feat.shape[-1])
        )
        seg = jnp.concatenate([point_feat, tiled], axis=-1)
        seg = MLP((512, 256, 128, 128), dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  name="seg_mlp")(seg, train=train, bn_momentum=bn_momentum)
        seg_logits = Dense(self.seg_classes, dtype=self.dtype, name="seg_out")(seg)

        return {"logits": cls_logits, "seg_logits": seg_logits, "end_points": end_points}

    @staticmethod
    def loss(outputs, batch, seg_weight: float = 0.5, reg_weight: float = 0.001):
        total, classify, seg = losses.joint_cls_seg_loss(
            outputs["logits"], outputs["seg_logits"],
            batch["labels"], batch["masks"], seg_weight,
        )
        mat = losses.transform_regularizer(outputs["end_points"]["transform"])
        total = total + reg_weight * mat
        return total, {
            "loss": total, "classify_loss": classify,
            "seg_loss": seg, "mat_diff_loss": mat,
        }


class PointNetPartSeg(nn.Module):
    """Part segmentation head (pointnet_partseg.py): per-point K-way part
    logits; loss is seg-only + orthogonality."""

    num_parts: int = 6
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        out = PointNetSeg(
            num_classes=15, seg_classes=self.num_parts, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="net",
        )(points, train=train, bn_momentum=bn_momentum)
        return {"seg_logits": out["seg_logits"], "end_points": out["end_points"]}

    @staticmethod
    def loss(outputs, batch, reg_weight: float = 0.001):
        import optax

        per_point = optax.softmax_cross_entropy_with_integer_labels(
            outputs["seg_logits"].astype(jnp.float32), batch["parts"]
        )
        seg = jnp.mean(per_point)
        mat = losses.transform_regularizer(outputs["end_points"]["transform"])
        total = seg + reg_weight * mat
        return total, {"loss": total, "seg_loss": seg, "mat_diff_loss": mat}
