"""Exact-key max-pool: bf16-speed pooling with f32-exact winner selection.

The pool_f32 study (SYNTH_HARD.md, round-3 VERDICT item 8) showed bf16
training of the max-pool families collapses because bf16 rounding creates
SPURIOUS TIES at the pool (near-equal rows round equal, diluting the pooled
gradient's credit assignment), and that keeping the final pre-pool layer f32
recovers the accuracy — but at ~45% of the bf16 speedup, because the f32
activations force genuine-f32 cotangents through the last layer's backward
matmuls (dW, dx), which run at a fraction of bf16 MXU rate.

This op decouples the two: the VALUE path ``y`` stays in the compute dtype
(bf16 cotangents everywhere, full-speed backward), while a stop-gradient f32
KEY tensor — the same activations before any bf16 rounding, costing only
elementwise f32 work — decides the winners and the tie split:

    pooled = y at argmax(key);  d y = (key == max key) / count * d pooled

Equal keys imply equal ``y`` values (the rounding map is deterministic), so
the forward pooled value is well-defined; rows that collide only AFTER
rounding are separated by the key, exactly as f32 training separates them.

Reference context: the reference trains f32 only; this is a net-new
mixed-precision mode (gated by SCANOBJECTNN_SA_POOL_F32=keys).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["exact_key_max_pool"]


def _winners(y, key, axis):
    kmax = jnp.max(key, axis=axis, keepdims=True)
    eq = key == kmax
    cnt = jnp.sum(eq.astype(jnp.float32), axis=axis)
    neg = jnp.asarray(-jnp.inf, y.dtype)
    pooled = jnp.max(jnp.where(eq, y, neg), axis=axis)
    return pooled, eq, cnt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def exact_key_max_pool(y, key, axis: int):
    """Max-pool ``y`` over ``axis`` with winners/ties decided by ``key``.

    Args:
      y: value tensor (any float dtype; typically the compute dtype).
      key: f32 selection keys, same shape — monotone-equivalent to ``y``
        but unrounded.  No gradient flows to it.
      axis: pooling axis (static).

    Returns pooled values in ``y.dtype``.  Backward splits the cotangent
    evenly across the EXACT-key winners (jnp.max's even tie split, but with
    f32 tie structure), cast to ``y.dtype``.
    """
    pooled, _, _ = _winners(y, key, axis)
    return pooled


def _ekmp_fwd(y, key, axis):
    pooled, eq, cnt = _winners(y, key, axis)
    # zero-size dtype tokens (residuals must be JAX types, not dtypes)
    return pooled, (eq, cnt, jnp.zeros((), y.dtype), jnp.zeros((), key.dtype))


def _ekmp_bwd(axis, res, d_pooled):
    eq, cnt, y_tok, key_tok = res
    scale = d_pooled.astype(jnp.float32) / cnt
    dy = jnp.where(eq, jnp.expand_dims(scale, axis), 0.0).astype(y_tok.dtype)
    return dy, jnp.zeros(eq.shape, key_tok.dtype)


exact_key_max_pool.defvjp(_ekmp_fwd, _ekmp_bwd)
