"""Fused TRAINING path for the grouped-MLP + max-pool tail of a PointNet++
SA layer: BN0 -> relu -> (Dense_i -> BN_i -> relu)* -> max over the neighbor
axis, as ONE custom-VJP op whose backward recomputes activations from the
layer-0 pre-activations instead of saving every [B, M, K, C] tensor across
the fwd->bwd boundary.

Reference semantics: /root/reference/pointnet2/utils/pointnet_util.py:87-154
(the conv2d+BN+relu stack over grouped neighborhoods + reduce_max) with
tf_util.batch_norm_template's training-mode batch statistics
(tf_util.py:480-514; eps 1e-3, biased variance, EMA running stats).

Why this exists (round-3 VERDICT item 1): the training backward of the
PointNet++ family was the biggest unfused surface left — XLA's default AD
saves y_1..y_L ([B, M, K, C] each) across the step's fwd->bwd boundary and
materializes every gradient tensor, ~76% of the MSG f32 step.  XLA-level
remat was measured NEGATIVE twice (whole-step and scale-level, commit
1856422): XLA's replay still round-trips every recomputed intermediate
through HBM.  The fix is the DGCNN fused-coefficient-backward analog: a
custom VJP whose backward runs a few Pallas passes that recompute the chain
from z1 TILES inside VMEM.

Boundary choice: the op takes z1 = Dense_0(grouped inputs) — the first
layer's PRE-BN activations — not the grouped inputs themselves.  Dense_0,
the neighbor gather, and the lift matmuls stay OUTSIDE, where XLA AD
already handles them through the existing custom-VJP one-hot gather/scatter
kernels.  Inside the boundary the recompute needs NO gathers: just z1 tiles
and the (tiny) per-layer weights/stats.

Training BN couples all rows through its batch statistics, so the backward
needs per-layer GLOBAL sums: with u_i = gamma_i*zhat_i + beta_i and
du_i = dy_i * (u_i > 0),

    S1_i = sum_rows du_i          (= dbeta_i)
    S2_i = sum_rows du_i * zhat_i (= dgamma_i)
    dz_i = r_i * gamma_i * (du_i - S1_i/R - zhat_i * S2_i/R)

(r_i = rsqrt(var_i + eps); the formula is exact including eps — the eps is
absorbed in r and zhat).  du_i depends on dz_{i+1}, so the sums are
sequential down the stack: the Pallas backward runs L+1 passes, pass p
emitting layer (L-1-p)'s sums (plus the dW/db partials that become
computable that pass) and the final pass emitting dz1.  Each pass re-reads
only the z1 tile — at MSG's K=128 scales that is ~4 reads of z1 vs the
dozens of [B, M, K, C] round trips XLA AD pays.

Gradient notes mirrored from the unfused stack (parity-tested):
  * max-pool ties split evenly (jnp.max's VJP; duplicate ball-padded rows
    tie bit-exactly, so counts match the unfused path).
  * relu'(0) = 0.
  * d(bias_i) = sum dz_i, analytically 0 for a Dense feeding BN
    (sum zhat = 0); the true numeric sum is returned.
  * The means/vars outputs feed the EMA running-stat update only; their
    cotangents are ignored (TF1 semantics: assign ops are not
    differentiated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["grouped_bn_mlp_pool"]

_EPS = 1e-3  # BatchNorm default in this stack (tf_util.py:508)


def _pool_f32_mode() -> str:
    """Mixed-precision max-pool modes (round-3 VERDICT item 8), configured
    via kernelconfig pool_precision (TrainerConfig ``--pool_precision``;
    the SCANOBJECTNN_SA_POOL_F32 env var overrides), read at trace time:

      "0"    — native (default): plain compute-dtype chain.
      "1"    — "f32": the final pre-pool layer's activations stay f32, so
               the pool's tie structure / credit assignment is exact (bf16
               rounding spuriously ties near-equal rows and dilutes the
               pooled gradient).  Measured: recovers synth-hard pointnet2
               bf16 0.253 → 0.558 (f32: 0.575) but keeps only ~55% of the
               bf16 speedup — the f32 activations force genuine-f32
               cotangents through the last layer's backward matmuls.
      "keys" — exact-key pooling (ops/exactpool.py): the value chain stays
               fully bf16 (fast backward) and a stop-gradient f32 key copy
               of the final activations decides winners/ties.  Unfused
               module paths only (the fused train tail falls back to
               unfused under this mode).  This is what
               ``pool_precision="auto"`` resolves to for bf16 training.

    All modes are no-ops in f32 training."""
    from scanobjectnn_tpu import kernelconfig

    return kernelconfig.pool_mode()


def _pool_f32() -> bool:
    """True for mode "1" — the form the fused satrain kernels implement."""
    return _pool_f32_mode() == "1"


def _layer_stats(z):
    """Biased batch statistics of z over all rows, in f32 (BatchNorm's)."""
    zf = z.astype(jnp.float32)
    mean = jnp.mean(zf, axis=tuple(range(z.ndim - 1)))
    mean2 = jnp.mean(jnp.square(zf), axis=tuple(range(z.ndim - 1)))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, var


def _fwd_chain(z1, gammas, betas, ws, bs, means=None, variances=None):
    """Forward recompute: per-layer (z, zhat, u, y) lists + pooled.

    With means/variances given (backward recompute), uses them; otherwise
    computes batch statistics (forward).  Numerics mirror the unfused
    Dense/BatchNorm modules: matmuls in z1.dtype with f32 accumulation,
    BN in f32, activations cast back to z1.dtype.
    """
    cdtype = z1.dtype
    n_layers = len(gammas)
    pool_f32 = _pool_f32()
    zs, zhats, ys = [], [], []
    out_means, out_vars = [], []
    h = z1
    for i in range(n_layers):
        if i > 0:
            h = (
                jnp.einsum(
                    "...i,io->...o",
                    ys[-1],
                    ws[i - 1].astype(cdtype),
                    preferred_element_type=jnp.float32,
                )
                + bs[i - 1]
            )
            # pool_f32: the last layer's pre-BN z stays f32 as well —
            # bf16-rounding z creates the same spurious pool ties as
            # rounding y (equal-rounded z -> equal zhat -> equal y).
            if not (i == n_layers - 1 and pool_f32):
                h = h.astype(cdtype)
        if means is None:
            mean, var = _layer_stats(h)
        else:
            mean, var = means[i], variances[i]
        out_means.append(mean)
        out_vars.append(var)
        zhat = (h.astype(jnp.float32) - mean) * lax.rsqrt(var + _EPS)
        u = zhat * gammas[i] + betas[i]
        y = jnp.maximum(u, 0.0)
        if not (i == n_layers - 1 and _pool_f32()):
            y = y.astype(cdtype)  # pool_f32: last layer stays f32 (see doc)
        zs.append(h)
        zhats.append(zhat)
        ys.append(y)
    # pooled follows ys[-1]'s dtype (f32 under pool_f32); the public op
    # casts to z1.dtype at its boundary, AFTER the tie structure is fixed.
    pooled = jnp.max(ys[-1], axis=-2)
    return zs, zhats, ys, pooled, out_means, out_vars


@jax.custom_vjp
def grouped_bn_mlp_pool(z1, gammas, betas, ws, bs):
    """Fused BN->relu->(Dense->BN->relu)*->max-pool over the neighbor axis.

    Args:
      z1: [B, M, K, C0] layer-0 pre-BN activations (Dense_0 output), in the
        compute dtype.  K must be a multiple of 8 for the Pallas backward.
      gammas/betas: per-layer BN scale/bias, f32 [C_i] (L entries).
      ws/bs: Dense kernels/biases for layers 1..L-1 (L-1 entries), f32.

    Returns (pooled [B, M, C_{L-1}] in z1.dtype, means tuple, vars tuple) —
    the stats are the per-layer batch statistics for the caller's EMA
    running-stat update (their cotangents are ignored, see module doc).
    """
    _, _, _, pooled, means, variances = _fwd_chain(z1, gammas, betas, ws, bs)
    return pooled.astype(z1.dtype), tuple(means), tuple(variances)


def _gbmp_fwd(z1, gammas, betas, ws, bs):
    out = grouped_bn_mlp_pool(z1, gammas, betas, ws, bs)
    pooled, means, variances = out
    return out, (z1, gammas, betas, ws, bs, means, variances)


def _bwd_xla(res, d_pooled):
    """Recompute backward in plain XLA — the non-TPU path and the parity
    oracle for the Pallas passes.  Saves only z1 + stats as residuals; the
    chain is recomputed here, so nothing [B, M, K, C]-sized crosses the
    fwd->bwd boundary."""
    z1, gammas, betas, ws, bs, means, variances = res
    n_layers = len(gammas)
    zs, zhats, ys, pooled, _, _ = _fwd_chain(
        z1, gammas, betas, ws, bs, means, variances
    )
    r_count = float(z1.shape[0] * z1.shape[1] * z1.shape[2])
    cdtype = z1.dtype

    # Max-pool backward with even tie split (jnp.max's VJP).
    eq = (ys[-1] == pooled[..., None, :]).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=-2, keepdims=True)
    dy = eq / cnt * d_pooled[..., None, :].astype(jnp.float32)

    dgammas, dbetas, dws, dbs = [], [], [], []
    dz = None
    for i in range(n_layers - 1, -1, -1):
        du = dy * (zhats[i] * gammas[i] + betas[i] > 0.0)
        s1 = jnp.sum(du, axis=tuple(range(du.ndim - 1)))
        s2 = jnp.sum(du * zhats[i], axis=tuple(range(du.ndim - 1)))
        dgammas.append(s2)
        dbetas.append(s1)
        r = lax.rsqrt(variances[i] + _EPS)
        dz = r * gammas[i] * (du - s1 / r_count - zhats[i] * (s2 / r_count))
        if i > 0:
            dws.append(
                jnp.einsum(
                    "bmki,bmko->io",
                    ys[i - 1].astype(jnp.float32),
                    dz,
                    preferred_element_type=jnp.float32,
                )
            )
            dbs.append(jnp.sum(dz, axis=tuple(range(dz.ndim - 1))))
            dy = jnp.einsum(
                "...o,io->...i", dz, ws[i - 1], preferred_element_type=jnp.float32
            )
    dz1 = dz.astype(cdtype)
    return (
        dz1,
        tuple(reversed(dgammas)),
        tuple(reversed(dbetas)),
        tuple(reversed(dws)),
        tuple(reversed(dbs)),
    )


def _use_pallas_bwd(z1) -> bool:
    import os

    from scanobjectnn_tpu.ops.fps import _use_pallas

    if os.environ.get("SCANOBJECTNN_SATRAIN_PALLAS", "1") == "0":
        return False  # probe switch: force the XLA recompute backward
    b, m, k, c0 = z1.shape
    return _use_pallas() and k % 8 == 0 and m % 8 == 0 and c0 % 8 == 0


def _gbmp_bwd(res, cot):
    d_pooled = cot[0]  # stat cotangents ignored (EMA updates, TF1 semantics)
    z1 = res[0]
    if _use_pallas_bwd(z1):
        from scanobjectnn_tpu.ops.pallas.satrain_bwd import bwd_pallas

        return bwd_pallas(res, d_pooled)
    return _bwd_xla(res, d_pooled)


grouped_bn_mlp_pool.defvjp(_gbmp_fwd, _gbmp_bwd)
