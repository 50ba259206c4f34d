"""3DmFV-Net: grid-GMM Fisher vectors + 3D Inception CNN classifier.

Behavioral references:
  * 3DmFV-Net/models/3dmfv_net_cls.py:29-102 — FV grid tensor
    [B, res, res, res, 20] → inception(64), inception(128), inception(256),
    maxpool3d /2, inception(256), inception(512), maxpool3d /2 → FC
    1024→256→128→num_classes, dropout keep 0.7.
  * inception_module (3dmfv_net_cls.py:86-102): 1³ conv n ‖ 3³ conv n/2 (on
    the 1³ output) ‖ 5³ conv n/2 (on the 1³ output) ‖ avgpool3³+1³ conv n,
    concat → 3n channels.
  * 3DmFV-Net/train.py:434-436 — the GMM is built once; here it is a static
    module attribute (subdivisions + variance), not a pickled sklearn object.

TPU notes: 3D convs map to conv_general_dilated (MXU); the whole FV layer is
fused elementwise/reduction math.  BatchNorm uses the reference's scheduled
bn_decay momentum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu.models import losses
from scanobjectnn_tpu.nn.fisher import FV_FEATURES, fisher_vector, get_3d_grid_gmm
from scanobjectnn_tpu.nn.layers import BatchNorm, Dense

__all__ = ["ThreeDmFVNet"]


class _Conv3D(nn.Module):
    features: int
    kernel: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,) * 3,
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        x = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name)(
            x, use_running_average=not train, momentum=bn_momentum
        )
        return nn.relu(x)


class _Inception(nn.Module):
    """1³ ‖ k1³(of 1³) ‖ k2³(of 1³) ‖ avgpool+1³ → concat (3n channels)."""

    n_filters: int
    kernel_sizes: tuple[int, int] = (3, 5)
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool, bn_momentum):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        n = self.n_filters
        k1, k2 = self.kernel_sizes
        one = _Conv3D(n, 1, name="conv1", **kw)(x, train, bn_momentum)
        three = _Conv3D(n // 2, k1, name="conv2", **kw)(one, train, bn_momentum)
        five = _Conv3D(n // 2, k2, name="conv3", **kw)(one, train, bn_momentum)
        pooled = nn.avg_pool(x, (k1, k1, k1), strides=(1, 1, 1), padding="SAME")
        pooled = _Conv3D(n, 1, name="conv4", **kw)(pooled, train, bn_momentum)
        return jnp.concatenate([one, three, five, pooled], axis=-1)


class ThreeDmFVNet(nn.Module):
    """3DmFV-Net classifier."""

    num_classes: int = 15
    subdivisions: tuple[int, int, int] = (5, 5, 5)
    variance: float = 0.04
    dropout_keep: float = 0.7
    learnable_gmm: bool = False
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = False, bn_momentum=0.9):
        b = points.shape[0]
        res = self.subdivisions
        gmm = get_3d_grid_gmm(self.subdivisions, self.variance)
        if self.learnable_gmm:
            # Learnable-GMM variant (3DmFV-Net/utils/tf_gmm_utils.py):
            # grid-initialized parameters trained jointly with the network.
            # Weights stay a simplex via softmax over logits; stddevs stay
            # positive via softplus of inverse-softplus-initialized raws.
            w_logits = self.param(
                "gmm_w_logits",
                lambda _k: jnp.log(jnp.asarray(gmm.weights, jnp.float32)),
            )
            gmm_w = jax.nn.softmax(w_logits)
            gmm_mu = self.param(
                "gmm_mu", lambda _k: jnp.asarray(gmm.means, jnp.float32)
            )
            raw_init = jnp.log(jnp.expm1(jnp.asarray(gmm.stddevs, jnp.float32)))
            gmm_sigma = jax.nn.softplus(
                self.param("gmm_sigma_raw", lambda _k: raw_init)
            )
        else:
            # Static grid GMM baked into the graph (the reference default:
            # built once in train.py:434-436 and fed as placeholders).
            gmm_w = jnp.asarray(gmm.weights, jnp.float32)
            gmm_mu = jnp.asarray(gmm.means, jnp.float32)
            gmm_sigma = jnp.asarray(gmm.stddevs, jnp.float32)
        fv = fisher_vector(points, gmm_w, gmm_mu, gmm_sigma)
        # [B, 20, G] -> [B, res, res, res, 20] (channels last).
        grid = fv.reshape(b, FV_FEATURES, *res)
        grid = jnp.transpose(grid, (0, 2, 3, 4, 1)).astype(self.dtype or jnp.float32)

        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        net = _Inception(64, name="inception1", **kw)(grid, train, bn_momentum)
        net = _Inception(128, name="inception2", **kw)(net, train, bn_momentum)
        net = _Inception(256, name="inception3", **kw)(net, train, bn_momentum)
        net = nn.max_pool(net, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        net = _Inception(256, name="inception4", **kw)(net, train, bn_momentum)
        net = _Inception(512, name="inception5", **kw)(net, train, bn_momentum)
        net = nn.max_pool(net, (2, 2, 2), strides=(2, 2, 2), padding="SAME")

        h = net.reshape(b, -1)
        for i, f in enumerate((1024, 256, 128)):
            h = Dense(f, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = BatchNorm(dtype=self.dtype, axis_name=self.bn_axis_name, name=f"bn{i + 1}")(
                h, use_running_average=not train, momentum=bn_momentum
            )
            h = nn.relu(h)
            h = nn.Dropout(rate=1.0 - self.dropout_keep, deterministic=not train)(h)
        logits = Dense(self.num_classes, dtype=self.dtype, name="fc4")(h)
        return {"logits": logits, "end_points": {}}

    @staticmethod
    def loss(outputs, batch):
        l = losses.softmax_cross_entropy(outputs["logits"], batch["labels"])
        return l, {"loss": l, "classify_loss": l}
