"""Shared loss components.

References: pointnet/models/pointnet_cls.py:80-93 (CE + orthogonality),
pointnet/models/pointnet_seg.py:113-135 (joint cls+seg BGA loss),
dgcnn/models/dgcnn.py get_loss (label-smoothed CE 0.2),
pointnet2/models/pointnet2_cls_bga.py:78-93.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "softmax_cross_entropy",
    "label_smoothed_cross_entropy",
    "transform_regularizer",
    "joint_cls_seg_loss",
]


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean sparse softmax cross-entropy (tf.nn.sparse_softmax_cross_entropy)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )
    return jnp.mean(ce)


def label_smoothed_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.2
) -> jnp.ndarray:
    """DGCNN's loss: CE against (1-s)·onehot + s/K (dgcnn get_loss)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    soft = onehot * (1.0 - smoothing) + smoothing / num_classes
    ce = optax.softmax_cross_entropy(logits.astype(jnp.float32), soft)
    return jnp.mean(ce)


def transform_regularizer(transform: jnp.ndarray) -> jnp.ndarray:
    """Orthogonality penalty ‖T·Tᵀ − I‖²/2 over the batch (tf.nn.l2_loss is
    sum(x²)/2; pointnet_cls.py:86-91)."""
    t = transform.astype(jnp.float32)
    k = t.shape[-1]
    diff = jnp.einsum("bij,bkj->bik", t, t) - jnp.eye(k, dtype=jnp.float32)
    return 0.5 * jnp.sum(jnp.square(diff))


def joint_cls_seg_loss(
    cls_logits: jnp.ndarray,
    seg_logits: jnp.ndarray,
    labels: jnp.ndarray,
    masks: jnp.ndarray,
    seg_weight: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """BGA joint loss: (1−w)·CE_cls + w·CE_seg (pointnet2_cls_bga.py:78-93).

    Returns (total, classify_loss, seg_loss)."""
    classify_loss = softmax_cross_entropy(cls_logits, labels)
    per_point = optax.softmax_cross_entropy_with_integer_labels(
        seg_logits.astype(jnp.float32), masks
    )
    seg_loss = jnp.mean(jnp.mean(per_point, axis=1))
    total = (1.0 - seg_weight) * classify_loss + seg_weight * seg_loss
    return total, classify_loss, seg_loss
