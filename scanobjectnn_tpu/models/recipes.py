"""Per-model training recipes.

The reference's PointCNN settings modules are half architecture, half
*training schedule* (PointCNN/pointcnn_cls/modelnet_x3_l4.py:25-46 and
pointcnn_seg/object_dataset_x3.py:27-42): a step-based staircase LR decay
with a floor, L2 weight decay applied through the graph's regularization
collection, a non-default Adam epsilon, and in-graph augmentation ranges
consumed by pointfly.get_xforms/augment (PointCNN/train.py:125-172).  The
other five families share the pointnet-style samples-based schedule + host
rotate/jitter augmentation, which TrainerConfig already models.

A ``TrainRecipe`` carries the PointCNN-style overrides; the registry attaches
one to each model that needs it and ``Trainer`` honors it unless the user
opts out (``use_model_recipe=False`` / ``--no_recipe``) — mirroring how the
reference's PointCNN driver reads everything from the settings module and
exposes no LR flags.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = ["TrainRecipe", "POINTCNN_RECIPE"]


@dataclass(frozen=True)
class TrainRecipe:
    """Trainer overrides a model family ships with.

    lr_mode 'steps': LR(step) = max(base · rate^floor(step/decay_steps), min)
    — tf.train.exponential_decay(staircase) on the global step
    (PointCNN/train.py:160-162), unlike the pointnet drivers' samples-based
    exponent (pointnet2/train.py:116-124).
    """

    lr_mode: str = "steps"
    learning_rate_base: float = 0.01
    decay_steps: int = 8000
    decay_rate: float = 0.5
    learning_rate_min: float = 1e-6
    weight_decay: float = 0.0
    adam_epsilon: float | None = None  # None → optax default (1e-8)
    # Augmentation: 'pointcnn' = in-graph per-cloud xform matmul + jitter
    # (pointfly.augment); 'rotate_jitter' = the host rotate+jitter recipe.
    augment: str = "rotate_jitter"
    jitter: float = 0.0
    rotation_range: tuple = (0.0, math.pi, 0.0, "u")
    scaling_range: tuple = (0.1, 0.1, 0.1, "g")
    # Reference driver defaults (informational; CLI flags still win).
    batch_size: int = 32
    num_epochs: int = 400
    sample_num: int = 1024


# PointCNN/pointcnn_cls/modelnet_x3_l4.py:25-46 == pointcnn_seg/
# object_dataset_x3.py:27-42,78 (identical training halves).
POINTCNN_RECIPE = TrainRecipe(
    lr_mode="steps",
    learning_rate_base=0.01,
    decay_steps=8000,
    decay_rate=0.5,
    learning_rate_min=1e-6,
    weight_decay=1e-5,
    adam_epsilon=1e-2,
    augment="pointcnn",
    jitter=0.0,
    rotation_range=(0.0, math.pi, 0.0, "u"),
    scaling_range=(0.1, 0.1, 0.1, "g"),
    batch_size=32,
    num_epochs=400,
    sample_num=1024,
)
