"""PointNet++ model family: SSG / MSG classifiers, BGA joint
classification+segmentation, and part segmentation.

Behavioral references:
  * pointnet2/models/pointnet2_cls_ssg.py:23-57 (SA pyramid + FC head)
  * pointnet2/models/pointnet2_cls_bga.py:21-93 (class-vector-conditioned FP
    decoder; note FP layer 1 interpolates from the 256-d class vector alone —
    the l3_points concat path is commented out in the reference — and SA1
    uses nsample=64 there vs 32 in SSG)
  * pointnet2/models/pointnet2_cls_partseg.py:18-87 (seg-only decoder)
  * MSG config from the upstream PointNet++ repo wired through
    pointnet_sa_module_msg (pointnet2/utils/pointnet_util.py:156-196)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu.models import losses
from scanobjectnn_tpu.nn.layers import BatchNorm, Dense, MLP
from scanobjectnn_tpu.nn.pointnet_modules import FPModule, SAModule, SAModuleMSG

__all__ = ["PointNet2ClsSSG", "PointNet2ClsMSG", "PointNet2BGA", "PointNet2PartSeg"]


class _ClsHead(nn.Module):
    """FC 512 → dropout → 256 → dropout → num_classes (ssg :41-45)."""

    num_classes: int
    dropout_keep: float = 0.5
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool, bn_momentum):
        for i, f in enumerate((512, 256)):
            h = Dense(f, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train, momentum=bn_momentum
            )
            h = nn.relu(h)
            h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        return Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)


class PointNet2ClsSSG(nn.Module):
    """SSG classifier: SA(512,0.2,32,[64,64,128]) → SA(128,0.4,64,[128,128,256])
    → SA(all,[256,512,1024]) → FC head (pointnet2_cls_ssg.py:23-57).

    ``SA_CONFIGS`` is the single source of truth for the SA pyramid — the
    forward iterates over it, and bench.py derives its analytic-FLOP and
    per-phase accounting from the same tuple + the live variables, so the
    benchmark cannot silently measure a different network than the model."""

    num_classes: int = 15
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    # (npoint, radius, nsample, mlp, group_all) per SA layer, in order.
    SA_CONFIGS = (
        (512, 0.2, 32, (64, 64, 128), False),
        (128, 0.4, 64, (128, 128, 256), False),
        (None, None, None, (256, 512, 1024), True),
    )
    HEAD_DIMS = (512, 256)  # _ClsHead fc1/fc2 widths (fc3 = num_classes)

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        xyz, feats = points, None
        for i, (npoint, radius, nsample, mlp, group_all) in enumerate(
            self.SA_CONFIGS
        ):
            xyz, feats, _ = SAModule(
                npoint, radius, nsample, mlp, group_all=group_all,
                name=f"sa{i + 1}", **kw,
            )(xyz, feats, train, bn_momentum)
        h = feats.reshape(points.shape[0], -1)
        logits = _ClsHead(self.num_classes, name="head", **kw)(h, train, bn_momentum)
        return {"logits": logits, "end_points": {}}

    loss = staticmethod(
        lambda outputs, batch: (
            lambda l: (l, {"loss": l, "classify_loss": l})
        )(losses.softmax_cross_entropy(outputs["logits"], batch["labels"]))
    )


class PointNet2ClsMSG(nn.Module):
    """Multi-scale-grouping classifier (upstream PointNet++ MSG config)."""

    num_classes: int = 15
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None
    # Scale-level remat (see SAModuleMSG.remat_scales): measured per config
    # before enabling — the default stays off.
    remat_scales: bool = False

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        msg_kw = dict(kw, remat_scales=self.remat_scales)
        l1_xyz, l1_points = SAModuleMSG(
            512, (0.1, 0.2, 0.4), (16, 32, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)), name="sa1", **msg_kw
        )(points, None, train, bn_momentum)
        l2_xyz, l2_points = SAModuleMSG(
            128, (0.2, 0.4, 0.8), (32, 64, 128),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)), name="sa2", **msg_kw
        )(l1_xyz, l1_points, train, bn_momentum)
        _, l3_points, _ = SAModule(
            None, None, None, (256, 512, 1024), group_all=True, name="sa3", **kw
        )(l2_xyz, l2_points, train, bn_momentum)
        h = l3_points.reshape(points.shape[0], -1)
        logits = _ClsHead(self.num_classes, name="head", **kw)(h, train, bn_momentum)
        return {"logits": logits, "end_points": {}}

    # Re-wrap: bare function assignment would rebind as an instance method
    # (class-attribute access through PointNet2ClsSSG unwraps staticmethod),
    # breaking the documented `model.loss(outputs, batch)` convention.
    loss = staticmethod(PointNet2ClsSSG.loss)


class PointNet2BGA(nn.Module):
    """BGA PointNet++: SA pyramid → class head whose 256-d penultimate
    activation (the "class vector") seeds the FP decoder → per-point 2-way
    mask head (pointnet2_cls_bga.py:21-76)."""

    num_classes: int = 15
    seg_classes: int = 2
    dropout_keep: float = 0.5
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        l0_xyz = points[..., :3]
        l1_xyz, l1_points, _ = SAModule(512, 0.2, 64, (64, 64, 128), name="sa1", **kw)(
            l0_xyz, None, train, bn_momentum
        )
        l2_xyz, l2_points, _ = SAModule(128, 0.4, 64, (128, 128, 256), name="sa2", **kw)(
            l1_xyz, l1_points, train, bn_momentum
        )
        l3_xyz, l3_points, _ = SAModule(
            None, None, None, (256, 512, 1024), group_all=True, name="sa3", **kw
        )(l2_xyz, l2_points, train, bn_momentum)

        # Classification branch; the 256-d post-fc2 activation is the class vector.
        h = l3_points.reshape(points.shape[0], -1)
        h = Dense(512, dtype=self.dtype, name="fc1")(h)
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
        class_vector = h[:, None, :]  # [B, 1, 256]
        h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        cls_logits = Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)

        # Segmentation branch: FP decoder seeded by the class vector at the
        # coarsest level (reference interpolates from class_vector alone).
        l2_up = FPModule((256, 256), name="fp1", **kw)(
            l2_xyz, l3_xyz, l2_points, class_vector, train, bn_momentum
        )
        l1_up = FPModule((256, 128), name="fp2", **kw)(
            l1_xyz, l2_xyz, l1_points, l2_up, train, bn_momentum
        )
        l0_up = FPModule((128, 128, 128), name="fp3", **kw)(
            l0_xyz, l1_xyz, None, l1_up, train, bn_momentum
        )

        seg = MLP((128,), name="seg_fc1", **kw)(l0_up, train=train, bn_momentum=bn_momentum)
        seg = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(seg)
        seg_logits = Dense(self.seg_classes, dtype=self.dtype, name="seg_fc2")(seg)

        return {"logits": cls_logits, "seg_logits": seg_logits, "end_points": {}}

    @staticmethod
    def loss(outputs, batch, seg_weight: float = 0.5):
        total, classify, seg = losses.joint_cls_seg_loss(
            outputs["logits"], outputs["seg_logits"],
            batch["labels"], batch["masks"], seg_weight,
        )
        return total, {"loss": total, "classify_loss": classify, "seg_loss": seg}


class PointNet2PartSeg(nn.Module):
    """Part segmentation: SA pyramid → plain FP decoder → per-point part
    logits, seg-only loss (pointnet2_cls_partseg.py:18-87; SA1 nsample=64)."""

    num_parts: int = 6
    dropout_keep: float = 0.5
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        l0_xyz = points[..., :3]
        l1_xyz, l1_points, _ = SAModule(512, 0.2, 64, (64, 64, 128), name="sa1", **kw)(
            l0_xyz, None, train, bn_momentum
        )
        l2_xyz, l2_points, _ = SAModule(128, 0.4, 64, (128, 128, 256), name="sa2", **kw)(
            l1_xyz, l1_points, train, bn_momentum
        )
        l3_xyz, l3_points, _ = SAModule(
            None, None, None, (256, 512, 1024), group_all=True, name="sa3", **kw
        )(l2_xyz, l2_points, train, bn_momentum)

        l2_up = FPModule((256, 256), name="fp1", **kw)(
            l2_xyz, l3_xyz, l2_points, l3_points, train, bn_momentum
        )
        l1_up = FPModule((256, 128), name="fp2", **kw)(
            l1_xyz, l2_xyz, l1_points, l2_up, train, bn_momentum
        )
        l0_up = FPModule((128, 128, 128), name="fp3", **kw)(
            l0_xyz, l1_xyz, None, l1_up, train, bn_momentum
        )

        seg = MLP((128,), name="seg_fc1", **kw)(l0_up, train=train, bn_momentum=bn_momentum)
        seg = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(seg)
        seg_logits = Dense(self.num_parts, dtype=self.dtype, name="seg_fc2")(seg)
        return {"seg_logits": seg_logits, "end_points": {}}

    @staticmethod
    def loss(outputs, batch):
        import optax

        per_point = optax.softmax_cross_entropy_with_integer_labels(
            outputs["seg_logits"].astype(jnp.float32), batch["parts"]
        )
        seg = jnp.mean(jnp.mean(per_point, axis=1))
        return seg, {"loss": seg, "seg_loss": seg}
