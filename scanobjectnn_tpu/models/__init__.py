"""Model registry.

The reference resolves models by module name via importlib
(pointnet2/train.py:68 ``importlib.import_module(FLAGS.model)``); here the
same names resolve through an explicit registry.  Every model is a flax
module whose ``__call__(points, train, bn_momentum)`` returns a dict with
``logits`` (classification) and/or ``seg_logits`` (per-point), plus
``end_points``; each carries a static ``loss(outputs, batch) -> (loss,
metrics)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from scanobjectnn_tpu.models import losses  # noqa: F401
from scanobjectnn_tpu.models.pointnet import (
    PointNetCls,
    PointNetPartSeg,
    PointNetSeg,
    TransformNet,
)
from scanobjectnn_tpu.models.pointnet2 import (
    PointNet2BGA,
    PointNet2ClsMSG,
    PointNet2ClsSSG,
    PointNet2PartSeg,
)
from scanobjectnn_tpu.models.dgcnn import DGCNN, DGCNNBGA
from scanobjectnn_tpu.models.spidercnn import SpiderCNNCls
from scanobjectnn_tpu.models.threedmfv import ThreeDmFVNet
from scanobjectnn_tpu.models.pointcnn import (
    PointCNNCls,
    PointCNNSeg,
    PointCNNSetting,
    modelnet_x3_l4,
    object_dataset_x3,
)
from scanobjectnn_tpu.models.recipes import TrainRecipe

__all__ = [
    "ModelSpec",
    "MODEL_REGISTRY",
    "TrainRecipe",
    "get_model",
    "get_recipe",
    "PointNetCls",
    "PointNetSeg",
    "PointNetPartSeg",
    "PointNet2ClsSSG",
    "PointNet2ClsMSG",
    "PointNet2BGA",
    "PointNet2PartSeg",
    "DGCNN",
    "DGCNNBGA",
    "TransformNet",
    "SpiderCNNCls",
    "ThreeDmFVNet",
    "PointCNNCls",
    "PointCNNSeg",
    "PointCNNSetting",
]


@dataclass(frozen=True)
class ModelSpec:
    """One registry entry.

    kind: 'cls' (labels), 'seg' (labels+masks), or 'partseg' (parts).
    """

    name: str
    cls: type
    kind: str
    defaults: dict[str, Any] = field(default_factory=dict)
    # Training-schedule overrides the family ships with (PointCNN's settings
    # modules carry the schedule; the others use the driver defaults).
    recipe: TrainRecipe | None = None

    def make(self, **overrides):
        kwargs = {**self.defaults, **overrides}
        return self.cls(**kwargs)


MODEL_REGISTRY: dict[str, ModelSpec] = {}


def _register(name: str, cls: type, kind: str, recipe: TrainRecipe | None = None, **defaults):
    MODEL_REGISTRY[name] = ModelSpec(
        name=name, cls=cls, kind=kind, defaults=defaults, recipe=recipe
    )


# Reference driver names (SURVEY.md §2.3) → flax modules.
_register("pointnet_cls", PointNetCls, "cls", use_tnet=True)
_register("pointnet_cls_basic", PointNetCls, "cls", use_tnet=False)
_register("pointnet_seg", PointNetSeg, "seg")
_register("pointnet_partseg", PointNetPartSeg, "partseg")
_register("pointnet2_cls_ssg", PointNet2ClsSSG, "cls")
_register("pointnet2_cls_msg", PointNet2ClsMSG, "cls")
_register("pointnet2_cls_bga", PointNet2BGA, "seg")
_register("pointnet2_cls_partseg", PointNet2PartSeg, "partseg")
_register("dgcnn", DGCNN, "cls")
_register("dgcnn_bga", DGCNNBGA, "seg")
_register("spidercnn_cls_xyz", SpiderCNNCls, "cls")
_register("3dmfv_net_cls", ThreeDmFVNet, "cls")
_register("pointcnn_cls", PointCNNCls, "cls", recipe=modelnet_x3_l4().recipe())
_register("pointcnn_seg", PointCNNSeg, "seg", recipe=object_dataset_x3().recipe())


def get_model(name: str, **overrides):
    """Instantiate a registered model; returns (module, loss_fn, kind)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    spec = MODEL_REGISTRY[name]
    module = spec.make(**overrides)
    return module, type(module).loss, spec.kind


def get_recipe(name: str) -> TrainRecipe | None:
    """The training recipe a model family ships with (None = driver defaults)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name].recipe
