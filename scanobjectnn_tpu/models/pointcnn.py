"""PointCNN: X-Conv classifier and encoder/decoder segmentation network.

Behavioral references:
  * PointCNN/pointcnn.py:55-159 (PointCNN class: xconv stack with
    random|fps|ids query sampling, optional xdconv decoder, FC head stack)
  * PointCNN/pointcnn.py:161-277 (PointCNN_SEG: shared encoder, FC
    classification branch + xdconv-decoder segmentation branch)
  * PointCNN/pointcnn_cls.py:10-16 (Net: eval-time mean-pool over
    representative points — the mean commutes with the affine logits layer,
    so outputs["logits"] = mean(per-point logits) IS the reference eval path)
  * settings modules PointCNN/pointcnn_cls/modelnet_x3_l4.py and
    PointCNN/pointcnn_seg/object_dataset_x3.py → `Setting` dataclasses here.
  * losses: tiled-label CE (PointCNN/train.py:139-140), joint cls+seg
    (PointCNN/train_seg.py:137-146); L2 weight decay 1e-5 is applied by the
    trainer's weight_decay config (train.py:164).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.models import losses
from scanobjectnn_tpu.nn.xconv import EluDense, XConv, inverse_density_sample

__all__ = [
    "XConvParam",
    "XDConvParam",
    "FCParam",
    "PointCNNSetting",
    "modelnet_x3_l4",
    "object_dataset_x3",
    "PointCNNCls",
    "PointCNNSeg",
]


@dataclass(frozen=True)
class XConvParam:
    K: int
    D: int
    P: int  # -1 == keep all points
    C: int
    links: tuple[int, ...] = ()


@dataclass(frozen=True)
class XDConvParam:
    K: int
    D: int
    pts_layer_idx: int
    qrs_layer_idx: int


@dataclass(frozen=True)
class FCParam:
    C: int
    dropout_rate: float


@dataclass(frozen=True)
class PointCNNSetting:
    """A settings module as a frozen dataclass (hashable → usable as a flax
    module attribute).

    Like the reference settings modules, this carries BOTH halves: the
    architecture pyramid AND the training schedule
    (modelnet_x3_l4.py:25-46 / object_dataset_x3.py:27-42,78 — lr base 0.01
    with step-based staircase decay 0.5 every 8000 steps floored at 1e-6,
    weight decay 1e-5, Adam epsilon 1e-2, in-graph rotation y∈[0,π] uniform +
    per-axis gaussian scaling σ=0.1, jitter 0).  ``recipe()`` hands the
    training half to the Trainer."""

    xconv_params: tuple[XConvParam, ...]
    fc_params: tuple[FCParam, ...] = ()
    xdconv_params: tuple[XDConvParam, ...] = ()
    fc_params_classification: tuple[FCParam, ...] = ()
    fc_params_segmentation: tuple[FCParam, ...] = ()
    with_X_transformation: bool = True
    with_global: bool = True
    sorting_method: str | None = None
    sampling: str = "random"  # random | fps | ids
    data_dim: int = 3
    use_extra_features: bool = False
    # Training half (reference settings-module vocabulary).
    learning_rate_base: float = 0.01
    decay_steps: int = 8000  # global STEPS (PointCNN/train.py:160)
    decay_rate: float = 0.5
    learning_rate_min: float = 1e-6
    weight_decay: float = 1e-5
    epsilon: float = 1e-2  # AdamOptimizer epsilon (train.py:167)
    jitter: float = 0.0
    rotation_range: tuple = (0.0, math.pi, 0.0, "u")
    scaling_range: tuple = (0.1, 0.1, 0.1, "g")
    batch_size: int = 32
    num_epochs: int = 400
    sample_num: int = 1024

    def recipe(self):
        """The training half as a TrainRecipe for the Trainer."""
        from scanobjectnn_tpu.models.recipes import TrainRecipe

        return TrainRecipe(
            lr_mode="steps",
            learning_rate_base=self.learning_rate_base,
            decay_steps=self.decay_steps,
            decay_rate=self.decay_rate,
            learning_rate_min=self.learning_rate_min,
            weight_decay=self.weight_decay,
            adam_epsilon=self.epsilon,
            augment="pointcnn",
            jitter=self.jitter,
            rotation_range=self.rotation_range,
            scaling_range=self.scaling_range,
            batch_size=self.batch_size,
            num_epochs=self.num_epochs,
            sample_num=self.sample_num,
        )


def modelnet_x3_l4(x: int = 3) -> PointCNNSetting:
    """PointCNN/pointcnn_cls/modelnet_x3_l4.py:54-67."""
    return PointCNNSetting(
        xconv_params=(
            XConvParam(8, 1, -1, 16 * x),
            XConvParam(12, 2, 384, 32 * x),
            XConvParam(16, 2, 128, 64 * x),
            XConvParam(16, 3, 128, 128 * x),
        ),
        fc_params=(FCParam(128 * x, 0.0), FCParam(64 * x, 0.8)),
        data_dim=6,
    )


def object_dataset_x3(x: int = 3) -> PointCNNSetting:
    """PointCNN/pointcnn_seg/object_dataset_x3.py:49-73."""
    return PointCNNSetting(
        xconv_params=(
            XConvParam(8, 1, -1, 16 * x),
            XConvParam(12, 2, 384, 32 * x),
            XConvParam(16, 2, 128, 64 * x),
            XConvParam(16, 3, 128, 128 * x),
        ),
        xdconv_params=(
            XDConvParam(16, 6, 3, 3),
            XDConvParam(16, 6, 3, 2),
            XDConvParam(12, 6, 2, 1),
            XDConvParam(8, 6, 1, 0),
            XDConvParam(8, 4, 0, 0),
        ),
        fc_params_classification=(FCParam(128 * x, 0.0), FCParam(64 * x, 0.8)),
        fc_params_segmentation=(FCParam(32 * x, 0.0), FCParam(32 * x, 0.5)),
        data_dim=3,
    )


class _PointCNNBackbone(nn.Module):
    """The shared xconv encoder (+ optional xdconv decoder).

    Returns (layer_pts, layer_fts) lists indexed like the reference's
    ``self.layer_pts`` / ``self.layer_fts`` (entry 0 = input)."""

    setting: PointCNNSetting
    decode: bool = False
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points, features, train: bool = False):
        s = self.setting
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        layer_pts = [points]
        if features is None:
            layer_fts = [None]
        else:
            c_fts = s.xconv_params[0].C // 2
            layer_fts = [EluDense(c_fts, name="features_hd", **kw)(features, train)]

        for layer_idx, lp in enumerate(s.xconv_params):
            pts = layer_pts[-1]
            fts = layer_fts[-1]
            n = pts.shape[1]
            if lp.P == -1 or (layer_idx > 0 and lp.P == s.xconv_params[layer_idx - 1].P):
                qrs = pts
                p = n
            else:
                p = lp.P
                if s.sampling == "fps":
                    fps_idx = ops.farthest_point_sample(pts, p)
                    qrs = ops.gather_point(pts, fps_idx)
                elif s.sampling == "ids":
                    key = self.make_rng("sampling") if self.has_rng("sampling") else jax.random.PRNGKey(0)
                    idx = inverse_density_sample(key, pts, lp.K, p)
                    qrs = ops.gather_point(pts, idx)
                elif s.sampling == "random":
                    # Points arrive pre-shuffled by the epoch pipeline, so a
                    # prefix slice is a uniform sample (pointcnn.py:101).
                    qrs = pts[:, :p, :]
                else:
                    raise ValueError(f"unknown sampling {s.sampling!r}")
            layer_pts.append(qrs)

            if layer_idx == 0:
                c_pts_fts = lp.C // 2 if fts is None else lp.C // 4
                depth_multiplier = 4
            else:
                c_prev = s.xconv_params[layer_idx - 1].C
                c_pts_fts = c_prev // 4
                depth_multiplier = math.ceil(lp.C / c_prev)
            with_global = s.with_global and layer_idx == len(s.xconv_params) - 1
            fts_xconv = XConv(
                K=lp.K, D=lp.D, C=lp.C, C_pts_fts=c_pts_fts,
                depth_multiplier=depth_multiplier,
                with_X_transformation=s.with_X_transformation,
                with_global=with_global, sorting_method=s.sorting_method,
                name=f"xconv_{layer_idx + 1}", **kw,
            )(pts, fts, qrs, train)
            fts_list = []
            for link in lp.links:
                linked = layer_fts[link]
                if linked is not None:
                    fts_list.append(linked[:, :p, :])
            if fts_list:
                fts_list.append(fts_xconv)
                layer_fts.append(jnp.concatenate(fts_list, axis=-1))
            else:
                layer_fts.append(fts_xconv)

        if self.decode:
            for layer_idx, dp in enumerate(s.xdconv_params):
                pts = layer_pts[dp.pts_layer_idx + 1]
                fts = layer_fts[dp.pts_layer_idx + 1] if layer_idx == 0 else layer_fts[-1]
                qrs = layer_pts[dp.qrs_layer_idx + 1]
                fts_qrs = layer_fts[dp.qrs_layer_idx + 1]
                c = s.xconv_params[dp.qrs_layer_idx].C
                c_prev = s.xconv_params[dp.pts_layer_idx].C
                fts_xdconv = XConv(
                    K=dp.K, D=dp.D, C=c, C_pts_fts=c_prev // 4, depth_multiplier=1,
                    with_X_transformation=s.with_X_transformation,
                    sorting_method=s.sorting_method,
                    name=f"xdconv_{layer_idx + 1}", **kw,
                )(pts, fts, qrs, train)
                fts_concat = jnp.concatenate([fts_xdconv, fts_qrs], axis=-1)
                fts_fuse = EluDense(c, name=f"xdconv_{layer_idx + 1}_fuse", **kw)(
                    fts_concat, train
                )
                layer_pts.append(qrs)
                layer_fts.append(fts_fuse)

        return layer_pts, layer_fts


class _FCHead(nn.Module):
    """FC stack with per-layer dropout + final affine logits."""

    fc_params: tuple[FCParam, ...]
    num_out: int
    prefix: str = "fc"
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, h, train: bool):
        for i, fc in enumerate(self.fc_params):
            h = EluDense(
                fc.C, name=f"{self.prefix}{i}",
                dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            )(h, train)
            h = nn.Dropout(rate=fc.dropout_rate, deterministic=not train)(h)
        return EluDense(
            self.num_out, with_bn=False, activation=False,
            name=f"{self.prefix}_logits", dtype=self.dtype,
        )(h, train)


class PointCNNCls(nn.Module):
    """PointCNN classifier (pointcnn_cls.py + PointCNN class).

    ``outputs["point_logits"]`` [B, P, C] drive the tiled-label training
    loss; ``outputs["logits"]`` is their mean over representative points —
    exactly the reference's eval path since the logits layer is affine.
    """

    num_classes: int = 15
    setting: PointCNNSetting = field(default_factory=modelnet_x3_l4)
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.99):
        del bn_momentum  # PointCNN uses fixed BN momentum 0.99
        features = None
        if self.setting.use_extra_features and points.shape[-1] > 3:
            features = points[..., 3:]
        _, layer_fts = _PointCNNBackbone(
            setting=self.setting, decode=False,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="backbone",
        )(points[..., :3], features, train)
        point_logits = _FCHead(
            self.setting.fc_params, self.num_classes,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="head",
        )(layer_fts[-1], train)  # [B, P, num_classes]
        return {
            "logits": jnp.mean(point_logits, axis=1),
            "point_logits": point_logits,
            "end_points": {},
        }

    @staticmethod
    def loss(outputs, batch):
        """Tiled-label CE over representative points (PointCNN/train.py:139-140)."""
        pl = outputs["point_logits"].astype(jnp.float32)
        labels = jnp.broadcast_to(batch["labels"][:, None], pl.shape[:2])
        l = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(pl, labels))
        return l, {"loss": l, "classify_loss": l}


class PointCNNSeg(nn.Module):
    """PointCNN_SEG: shared encoder, classification FC branch on the coarsest
    features + xdconv-decoder segmentation branch (pointcnn.py:161-277,
    pointcnn_seg.py:9-19)."""

    num_classes: int = 15
    seg_classes: int = 2
    setting: PointCNNSetting = field(default_factory=object_dataset_x3)
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.99):
        del bn_momentum
        s = self.setting
        features = None
        if s.use_extra_features and points.shape[-1] > 3:
            features = points[..., 3:]
        layer_pts, layer_fts = _PointCNNBackbone(
            setting=s, decode=True,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="backbone",
        )(points[..., :3], features, train)

        # Classification branch reads the ENCODER's final features — index
        # len(xconv_params) in layer_fts (the decoder appended after it).
        enc_fts = layer_fts[len(s.xconv_params)]
        point_logits = _FCHead(
            s.fc_params_classification, self.num_classes, prefix="fc_class_",
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="cls_head",
        )(enc_fts, train)

        seg_logits = _FCHead(
            s.fc_params_segmentation, self.seg_classes, prefix="fc_seg_",
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="seg_head",
        )(layer_fts[-1], train)  # [B, N, seg_classes]

        return {
            "logits": jnp.mean(point_logits, axis=1),
            "point_logits": point_logits,
            "seg_logits": seg_logits,
            "end_points": {},
        }

    @staticmethod
    def loss(outputs, batch, seg_weight: float = 0.5):
        """(1−w)·tiled-label CE + w·per-point seg CE (train_seg.py:137-146)."""
        pl = outputs["point_logits"].astype(jnp.float32)
        labels = jnp.broadcast_to(batch["labels"][:, None], pl.shape[:2])
        classify = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(pl, labels))
        per_point = optax.softmax_cross_entropy_with_integer_labels(
            outputs["seg_logits"].astype(jnp.float32), batch["masks"]
        )
        seg = jnp.mean(jnp.mean(per_point, axis=1))
        total = (1.0 - seg_weight) * classify + seg_weight * seg
        return total, {"loss": total, "classify_loss": classify, "seg_loss": seg}
