"""Core NN layers.

Behavioral reference: /root/reference/pointnet2/utils/tf_util.py — but NOT its
structure.  The reference phrases per-point MLPs as 1x1/1x3 conv2d over a
[B, N, 1, C] "image" (tf_util.py:120-199) because TF1's conv path was the fast
one on GPU; on TPU the idiomatic and fastest form is a plain Dense on the last
axis of [B, ..., C] — XLA maps the batched matmul straight onto the MXU and
fuses BN+ReLU into it.  So every reference conv2d/fully_connected becomes a
`Dense`, and the shared-MLP stacks become `PointMLP`.

Faithful semantics kept:
  * BatchNorm: eps 1e-3 (tf_util.py:508), EMA over running stats with a
    CALL-TIME momentum — the reference ramps bn_decay 0.5→0.99 on a schedule
    (train.py:126-134), so momentum must be a traced argument, which rules out
    flax's fixed-attribute BatchNorm.
  * Weight init: Xavier/glorot uniform (tf_util._variable_with_weight_decay
    use_xavier=True default), bias zeros.
  * Dropout: specified as keep_prob in the reference; here as flax-style rate
    (rate = 1 - keep_prob) via nn.Dropout.
  * GroupNorm with G=16 for SpiderCNN (SpiderCNN/utils/tf_util.py:407-451).

Multi-chip: BatchNorm accepts ``axis_name`` — when set and inside shard_map /
pjit with a mapped batch axis, batch statistics are psum-averaged across the
mesh (the TPU-native replacement for the reference's vestigial CPU-pinned
``batch_norm_dist_template``, dgcnn/utils/tf_util.py:502-535).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["BatchNorm", "Dense", "MLP", "PointMLP", "GroupNorm"]

default_kernel_init = nn.initializers.glorot_uniform()


class BatchNorm(nn.Module):
    """Batch normalization with call-time EMA momentum (``bn_decay``).

    Running statistics live in the ``batch_stats`` collection.  In training
    (``use_running_average=False``) the batch statistics normalize and the
    running stats update as ``ra = m * ra + (1 - m) * batch`` where ``m`` is
    the scheduled bn_decay; in eval the running stats normalize.
    """

    epsilon: float = 1e-3
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool,
        momentum: jnp.ndarray | float = 0.9,
        override_stats: tuple | None = None,
        update_only: bool = False,
        f32_key_input: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """``update_only=True`` performs ONLY the EMA running-stat update
        with externally computed batch statistics (``override_stats``) and
        returns ``x`` unchanged — the hook for fused kernels that normalize
        inside their own program (the fused SA TRAINING path) while this
        module keeps owning the scale/bias params and running stats so the
        variable tree stays identical to the unfused path.

        ``f32_key_input`` (exact-key pooling, ops/exactpool.py): an
        unrounded f32 copy of ``x`` — when given, the call ALSO returns a
        stop-gradient f32 normalization of it under the SAME statistics
        (the pool's selection keys).  Returns ``(y, key)``."""
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if update_only:
            mean, var = override_stats
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
            return x

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        out = y.astype(self.dtype or x.dtype)
        if f32_key_input is not None:
            sg = jax.lax.stop_gradient
            key = (sg(f32_key_input) - sg(mean)) * jax.lax.rsqrt(
                sg(var) + self.epsilon
            )
            key = key * sg(scale) + sg(bias)
            return out, key
        return out


class Dense(nn.Module):
    """Linear layer with the reference's glorot-uniform/zeros init; replaces
    both tf_util.fully_connected and every 1x1-conv per-point MLP step.

    ``highest_cols=(a, b)`` multiplies input channels [a, b) against their
    kernel rows at ``precision=HIGHEST`` (f32-exact products) while the rest
    run at the default (bf16-operand) MXU precision, and the OUTPUT stays
    f32 (no final downcast): the option exists to feed an exact cancellation
    downstream (LiftedGroupMLP subtracts products of UNCENTERED coordinates,
    ``p·W − q·W``), and rounding the output would re-quantize the large
    uncentered values (bf16 quantum at ``|p·W|``, not at ``|p−q|·|W|``) and
    defeat the exact rows.  The caller rounds after its subtraction.

    ``keep_f32_output=True`` skips only the final downcast (operands still
    run in the compute dtype): the matmul's f32 accumulation reaches the
    caller unrounded.  Used by the pool_f32 mixed-precision mode, where the
    final pre-pool layer must stay f32 so max-pool tie credit is exact."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: Callable = default_kernel_init
    highest_cols: tuple[int, int] | None = None
    keep_f32_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype

        def mm(xs, ks, precision=None):
            return jnp.einsum(
                "...i,io->...o", xs, ks,
                preferred_element_type=jnp.float32, precision=precision,
            )

        if self.highest_cols is None:
            y = mm(x.astype(dtype), kernel.astype(dtype))
        else:
            a, c = self.highest_cols
            y = mm(
                x[..., a:c].astype(jnp.float32), kernel[a:c],
                precision=jax.lax.Precision.HIGHEST,
            )
            if a > 0:
                y = y + mm(x[..., :a].astype(dtype), kernel[:a].astype(dtype))
            if c < x.shape[-1]:
                y = y + mm(x[..., c:].astype(dtype), kernel[c:].astype(dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        if self.highest_cols is not None or self.keep_f32_output:
            return y
        return y.astype(dtype)


def mlp_final_max(
    mdl,
    x: jnp.ndarray,
    feature: int,
    index: int,
    axis: int,
    train: bool,
    bn_momentum,
    bn: bool = True,
    skip_dense: bool = False,
    x32: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Final Dense→BN→relu→max-pool step of a shared-MLP stack, honoring the
    pool_f32 mixed-precision modes (satrain_kernel._pool_f32_mode):

      "0"    plain compute-dtype chain (also all eval calls);
      "1"    layer activations stay f32 across the pool (exact ties, but
             genuine-f32 cotangents through the layer's backward matmuls);
      "keys" value chain stays in the compute dtype; a stop-gradient f32
             key copy (same matmul accumulation — only elementwise BN/relu
             is duplicated) decides winners/ties via exact_key_max_pool.

    ``mdl`` owns the params (dense_{index}/bn_{index} — the MLP tree).
    ``skip_dense`` handles layers with no Dense of their own
    (LiftedGroupMLP's layer 0); ``x32`` then optionally supplies the
    layer's unrounded f32 pre-BN input for exact keys.  Returns the pooled
    tensor in the compute dtype.
    """
    from jax import lax

    from scanobjectnn_tpu.ops.exactpool import exact_key_max_pool
    from scanobjectnn_tpu.ops.pallas.satrain_kernel import _pool_f32_mode

    mode = _pool_f32_mode() if train else "0"
    cdtype = mdl.dtype or x.dtype
    if (
        mode == "keys"
        and not skip_dense
        and bn
        and mdl.bn_axis_name is None  # fused op computes local batch stats
        and cdtype == jnp.bfloat16  # f32 keys==values: keep the module path
        and not mdl.is_initializing()
    ):
        # Fused final layer (ops/exactpool.dense_bn_exactkey_pool): the
        # whole Dense→BN→relu→exact-key-pool step as one custom-VJP op —
        # no f32 [.., K, C] residual crosses the fwd→bwd boundary (the
        # backward recomputes from the bf16 input; only the per-channel
        # batch stats are saved) and the last layer's dx/dW matmuls run on a
        # bf16-rounded cotangent.  Pooled values bit-equal to the module
        # chain below (parity-tested); params stay owned by the same
        # dense_{index}/bn_{index} modules (BatchNorm in update_only mode
        # keeps the running stats).
        from scanobjectnn_tpu.ops.exactpool import dense_bn_exactkey_pool

        params = mdl.variables["params"]
        pooled, mean, var = dense_bn_exactkey_pool(
            x.astype(cdtype),
            params[f"dense_{index}"]["kernel"],
            params[f"dense_{index}"]["bias"],
            params[f"bn_{index}"]["scale"],
            params[f"bn_{index}"]["bias"],
            axis,
        )
        BatchNorm(
            dtype=mdl.dtype, axis_name=mdl.bn_axis_name, name=f"bn_{index}"
        )(
            mean, use_running_average=False, momentum=bn_momentum,
            override_stats=(mean, var), update_only=True,
        )
        return pooled.astype(cdtype)
    if mode == "keys":
        if skip_dense:
            h32 = (x32 if x32 is not None else x).astype(jnp.float32)
            z = x
        else:
            h32 = Dense(
                feature, dtype=mdl.dtype, keep_f32_output=True,
                name=f"dense_{index}",
            )(x)
            z = h32.astype(cdtype)
        if bn:
            z, key = BatchNorm(
                dtype=mdl.dtype, axis_name=mdl.bn_axis_name,
                name=f"bn_{index}",
            )(
                z, use_running_average=not train, momentum=bn_momentum,
                f32_key_input=h32,
            )
        else:
            key = lax.stop_gradient(h32)
        y = nn.relu(z)
        key = jnp.maximum(key, 0.0)
        return exact_key_max_pool(y, key, axis).astype(cdtype)
    lastf = mode == "1"
    if not skip_dense:
        x = Dense(
            feature, dtype=mdl.dtype, keep_f32_output=lastf,
            name=f"dense_{index}",
        )(x)
    if bn:
        x = BatchNorm(
            dtype=jnp.float32 if lastf else mdl.dtype,
            axis_name=mdl.bn_axis_name, name=f"bn_{index}",
        )(x, use_running_average=not train, momentum=bn_momentum)
    x = nn.relu(x)
    return jnp.max(x, axis=axis).astype(cdtype)


class MLP(nn.Module):
    """Dense→BN→ReLU stack over the last axis (a reference "shared MLP").

    ``bn=False`` drops normalization; ``activate_final=False`` leaves the last
    layer linear (classifier heads).

    ``final_max_axis`` declares that the stack ends in a max-pool over that
    axis: the MLP performs the pool itself (returning the pooled tensor) so
    the pool_f32 mixed-precision modes (see ``mlp_final_max``) can keep the
    final layer's tie structure exact in bf16 training.
    """

    features: Sequence[int]
    bn: bool = True
    activate_final: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None
    final_max_axis: int | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, bn_momentum=0.9
    ) -> jnp.ndarray:
        n = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n - 1
            if last and self.final_max_axis is not None:
                assert self.activate_final, "final_max_axis needs activation"
                return mlp_final_max(
                    self, x, f, i, self.final_max_axis, train, bn_momentum,
                    bn=self.bn,
                )
            x = Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            if last and not self.activate_final:
                break
            if self.bn:
                x = BatchNorm(
                    dtype=self.dtype, axis_name=self.bn_axis_name,
                    name=f"bn_{i}",
                )(x, use_running_average=not train, momentum=bn_momentum)
            x = nn.relu(x)
        return x


# A per-point shared MLP is the same computation; the alias keeps model code
# readable where the reference used conv2d stacks over grouped neighborhoods.
PointMLP = MLP


class GroupNorm(nn.Module):
    """Group normalization (SpiderCNN's norm, G=16,
    SpiderCNN/utils/tf_util.py:407-451)."""

    num_groups: int = 16
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=self.dtype
        )(x)
