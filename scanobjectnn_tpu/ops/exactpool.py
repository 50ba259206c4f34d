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
from jax import lax

__all__ = ["exact_key_max_pool", "dense_bn_exactkey_pool"]


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


# --------------------------------------------------------------------------
# Fused final layer: Dense -> BN(train) -> relu -> exact-key max-pool as ONE
# custom-VJP op (round-4 VERDICT item 5).
#
# The module-level "keys" mode (nn.layers.mlp_final_max) pays two hidden
# f32 costs at [B, M, K, C] scale: (a) the Dense keeps its f32 output as a
# SAVED residual (plus the f32 key tensor and the winner mask) across the
# fwd->bwd boundary, and (b) the value chain's cotangent enters the last
# layer's dx/dW matmuls as an f32 tensor, forcing genuine-f32 MXU passes
# even though its CONTENT is bf16-rounded (it flowed through the bf16
# value chain).  This op fixes both: the backward RECOMPUTES the f32 chain
# from the bf16 inputs (bit-identical — same ops, same dtypes; only the
# per-channel batch stats are saved), and rounds the last-layer cotangent to
# bf16 before the dx/dW matmuls (the repo's gradient-precision convention,
# cf. onehot._SCATTER_TERMS).
#
# Forward semantics replicate mlp_final_max's keys branch EXACTLY (pooled
# values bit-equal, parity-tested): z32 = x@W + b with bf16 operands and
# f32 accumulation; BATCH STATS COMPUTED FROM THE bf16-ROUNDED z (that is
# what the BatchNorm module sees there); the value chain normalizes the
# rounded z and pools in bf16; the f32 keys normalize the UNROUNDED z32
# under the same stats and decide winners/ties (stop-gradient).
# --------------------------------------------------------------------------

_BN_EPS = 1e-3


def _poolkey_ok(z_shape, axis, eps) -> bool:
    """Opt-in experiment switch (SCANOBJECTNN_POOLKEY=1) for the fused
    Pallas keys-mode forward (poolkey_kernel) — measured NEGATIVE on v5e
    and parity-broken by engine precision, so it ships DEFAULT OFF:

    * slower: ssg B16 N1024 loss+grad 6.99 ms vs 5.35 XLA chain (the
      kernel's fwd-only overhead, 1.67 ms over plain bf16, exceeds the XLA
      chain's ENTIRE fwd+bwd overhead of 1.26) — the Mosaic elementwise-
      rate deficit the satrain kernels documented, reconfirmed on a
      minimal elementwise+reduce program;
    * on-chip pooled values differ from the XLA chain on ~26% of elements
      (1 bf16 ulp): Mosaic's rsqrt/FMA contraction differs from XLA TPU's
      at ~1e-4 relative, shifting bf16 roundings — gradients stay
      bit-equal (the backward recomputes its own winner mask), and
      interpret-mode parity is exact (tests), but the production bit-
      parity contract fails on hardware.

    Full account: SYNTH_HARD.md round-5 section."""
    import os

    if os.environ.get("SCANOBJECTNN_POOLKEY", "0") != "1":
        return False
    if eps != _BN_EPS:
        return False
    from scanobjectnn_tpu.ops.fps import _use_pallas
    from scanobjectnn_tpu.ops.pallas.poolkey_kernel import poolkey_eligible

    return _use_pallas() and poolkey_eligible(z_shape, axis)


def _fused_forward(x, w, b, gamma, beta, eps):
    """z32 + batch stats in XLA, then ONE Pallas pass for both elementwise
    chains + the tie-split pool (values bit-equal to _dbep_chain — the
    kernel replicates its op order exactly).  Returns (pooled, mean, var,
    pooled_key)."""
    from scanobjectnn_tpu.ops.pallas.onehot import _interpret
    from scanobjectnn_tpu.ops.pallas.poolkey_kernel import (
        bn_relu_exactkey_pool,
    )

    cdtype = x.dtype
    z32 = (
        jnp.einsum(
            "...i,io->...o", x, w.astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        + b
    )
    zbf = z32.astype(cdtype).astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(zbf, axis=axes)
    mean2 = jnp.mean(jnp.square(zbf), axis=axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    pooled, kmax, _ = bn_relu_exactkey_pool(
        z32, gamma, beta, mean, var, cdtype, _interpret()
    )
    return pooled, mean, var, kmax


def _dbep_chain(x, w, b, gamma, beta, eps):
    """Shared forward math; returns every intermediate the bwd reuses."""
    cdtype = x.dtype
    z32 = (
        jnp.einsum(
            "...i,io->...o", x, w.astype(cdtype),
            preferred_element_type=jnp.float32,
        )
        + b
    )  # f32 accumulation, bf16 operands (Dense keep_f32_output semantics)
    zb = z32.astype(cdtype)
    zbf = zb.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(zbf, axis=axes)
    mean2 = jnp.mean(jnp.square(zbf), axis=axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    r = lax.rsqrt(var + eps)
    zhat = (zbf - mean) * r
    u = zhat * gamma + beta
    y = jnp.maximum(u.astype(cdtype), 0)  # == bf16(relu(u)): relu commutes
    key = jnp.maximum((z32 - mean) * r * gamma + beta, 0.0)  # f32, unrounded z
    return z32, zhat, r, mean, var, u, y, key


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dense_bn_exactkey_pool(x, w, b, gamma, beta, axis: int, eps: float = _BN_EPS):
    """Fused Dense -> train-mode BN -> relu -> exact-key max-pool.

    x [..., K, C_in] in the compute dtype (bf16); w [C_in, C] f32 kernel;
    b/gamma/beta f32.  Returns (pooled [..., C] in x.dtype, mean, var) —
    the batch statistics feed the caller's EMA running-stat update (their
    cotangents are ignored, TF1 assign semantics).  Pooled values are
    bit-equal to the unfused keys-mode chain (tested).

    Forward dispatch: on the Pallas backend the elementwise chains + pool
    run as ONE VMEM pass over z32 (ops/pallas/poolkey_kernel.py — one f32
    read instead of XLA's value/key/eq-mask passes); bit-exact, so the
    dispatch is a pure-speed choice (SCANOBJECTNN_POOLKEY=0 probes the
    XLA chain)."""
    z_shape = x.shape[:-1] + (w.shape[-1],)
    if _poolkey_ok(z_shape, axis, eps):
        pooled, mean, var, _ = _fused_forward(x, w, b, gamma, beta, eps)
        return pooled, mean, var
    _, _, _, mean, var, _, y, key = _dbep_chain(x, w, b, gamma, beta, eps)
    pooled, _, _ = _winners(y, key, axis)
    return pooled, mean, var


def _dbep_fwd(x, w, b, gamma, beta, axis, eps):
    z_shape = x.shape[:-1] + (w.shape[-1],)
    if _poolkey_ok(z_shape, axis, eps):
        pooled, mean, var, _ = _fused_forward(x, w, b, gamma, beta, eps)
        return (pooled, mean, var), (x, w, b, gamma, beta, mean, var)
    z32, zhat, r, mean, var, u, y, key = _dbep_chain(x, w, b, gamma, beta, eps)
    pooled, eq, cnt = _winners(y, key, axis)
    # residuals: only the inputs + [..., C]-sized stats — no [..., K, C]
    # tensor crosses the fwd->bwd boundary.  The winner mask is recomputed
    # in the backward FROM ITS OWN recomputed keys (not a saved pooled_key):
    # the fused Pallas forward's keys can differ from the XLA recompute by
    # 1 ulp (XLA fuses the affine chain into FMAs; Mosaic rounds the
    # product), and a cross-engine key/kmax compare would shatter the eq
    # mask.  Self-consistent recompute makes the backward IDENTICAL across
    # dispatch paths (kernel-path gradients are bit-equal to XLA-path
    # gradients by construction).
    return (pooled, mean, var), (x, w, b, gamma, beta, mean, var)


def _dbep_bwd(axis, eps, res, cots):
    x, w, b, gamma, beta, mean, var = res
    d_pooled = cots[0].astype(jnp.float32)  # stat cotangents ignored (EMA)
    cdtype = x.dtype
    z32, zhat, r, _, _, u, y, key = _dbep_chain(x, w, b, gamma, beta, eps)

    # pool backward: even split across the exact-key winners.  kmax comes
    # from THIS recompute's keys (see _dbep_fwd's residual note) so the
    # mask is self-consistent regardless of which engine ran the forward.
    pooled_key = jnp.max(key, axis=axis)
    eq = key == jnp.expand_dims(pooled_key, axis)
    cnt = jnp.sum(eq.astype(jnp.float32), axis=axis)
    dy = jnp.where(eq, jnp.expand_dims(d_pooled / cnt, axis), 0.0)

    # relu (value chain) + BN-train backward (batch stats of the ROUNDED z)
    du = jnp.where(u.astype(cdtype) > 0, dy, 0.0)
    naxes = tuple(range(x.ndim - 1))
    n_rows = 1.0
    for a in naxes:
        n_rows *= x.shape[a]
    s1 = jnp.sum(du, axis=naxes)
    s2 = jnp.sum(du * zhat, axis=naxes)
    dgamma = s2
    dbeta = s1
    dz = r * gamma * (du - s1 / n_rows - zhat * (s2 / n_rows))
    db = jnp.sum(dz, axis=naxes)
    # gradient-precision convention: the cotangent's CONTENT came through
    # the bf16 value chain; round it before the big matmuls so dx/dW run
    # at bf16 MXU rate (cf. the 2-term scatter gradient convention).
    dzc = dz.astype(cdtype)
    dx = jnp.einsum(
        "...o,io->...i", dzc, w.astype(cdtype),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)
    dw = jnp.einsum(
        "...i,...o->io", x, dzc, preferred_element_type=jnp.float32
    )
    return dx, dw, db, dgamma, dbeta


dense_bn_exactkey_pool.defvjp(_dbep_fwd, _dbep_bwd)
