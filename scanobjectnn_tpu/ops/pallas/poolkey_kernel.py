"""Fused forward for exact-key max-pooling: BN(train) + relu + f32-key
tie-split pool in ONE VMEM pass over the final layer's f32 pre-activations.

STATUS: measured NEGATIVE on v5e — ships as an opt-in experiment
(``SCANOBJECTNN_POOLKEY=1``), default OFF.  Record below and in
SYNTH_HARD.md ("Fused exact-key pool").

Why it was built (round-5, VERDICT item 5): the exact-key mixed-precision
mode (ops/exactpool.py) recovers bf16 training quality but kept only ~58%
of the bf16 speedup, with the overhead pinned on the FORWARD f32 widening
of the final-layer tensors — under XLA the f32 ``z32`` feeds multiple
fused consumer passes (batch-stats reduce, the bf16 value chain, the f32
key chain + eq-mask).  This kernel collapses the value chain, key chain,
winner mask and tie-count into a single read of ``z32`` per tile, emitting
only [R, C]-sized outputs; the batch statistics stay an XLA reduce (they
must complete before any tile can normalize).

Measured (scripts/profile_poolf32.py, two-point protocol):

* SLOWER despite the traffic cut: ssg B16 N1024 loss+grad 6.99 ms vs the
  XLA chain's 5.35; the kernel's fwd-only overhead over plain bf16
  (1.67 ms) exceeds the XLA chain's ENTIRE fwd+bwd overhead (1.26 ms).
  Mosaic's elementwise rate at these shapes runs far off XLA's fused
  rate — the same deficit the satrain kernels measured (2.4-3.5x),
  reconfirmed here on a minimal elementwise+reduce program with no
  one-hot machinery to blame.
* BIT-PARITY FAILS ON HARDWARE: ~26% of pooled elements differ by 1 bf16
  ulp vs the XLA chain (B16 SA1 probe: ndiff 269527/1048576, maxdiff
  3.1e-2 at activation scale ~4).  Cause: Mosaic's rsqrt (and/or FMA
  contraction) differs from XLA TPU's at ~1e-4 relative — enough to
  shift bf16 roundings wholesale.  Interpret-mode parity is exact
  (tests/test_exactpool.py), and GRADIENTS are bit-equal across dispatch
  because the custom-VJP backward recomputes its own winner mask
  (exactpool._dbep_bwd) — but the forward's production bit-parity
  contract cannot be met by a Mosaic elementwise chain.

Both findings generalize: in-kernel recompute of XLA-traced f32
elementwise chains is neither faster nor bit-compatible on this chip —
the closing argument for SYNTH_HARD.md's retention floor.

Reference context: the reference trains f32 only (pointnet2/utils/
tf_util.py:480-514 BN + reduce_max of pointnet_util.py:87-154); exact-key
pooling is a net-new TPU mixed-precision mode, so this kernel has no
reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bn_relu_exactkey_pool", "poolkey_eligible"]

_EPS = 1e-3


def _kernel(z_ref, gamma_ref, beta_ref, mean_ref, var_ref,
            pooled_ref, kmax_ref, cnt_ref, *, cdtype):
    z = z_ref[...]  # [T, K, C] f32 (pre-BN, bias included)
    # Bit-parity contract: the op ORDER below replicates
    # exactpool._dbep_chain exactly — ((z - mean) * r) * gamma + beta, NOT
    # an algebraically-equal precomputed scale/shift form, whose different
    # rounding would break the pooled-values-bit-equal claim.
    r = lax.rsqrt(var_ref[0][None, None, :] + _EPS)
    mean = mean_ref[0][None, None, :]
    gamma = gamma_ref[0][None, None, :]
    beta = beta_ref[0][None, None, :]

    # Value chain: normalize the ROUNDED z (what the BatchNorm module sees
    # in keys mode), activation rounded to the compute dtype before relu.
    zbf = z.astype(cdtype).astype(jnp.float32)
    u = (zbf - mean) * r * gamma + beta
    y = jnp.maximum(u.astype(cdtype).astype(jnp.float32), 0.0)

    # Key chain: same affine on the UNROUNDED z, relu'd — f32 throughout.
    key = jnp.maximum((z - mean) * r * gamma + beta, 0.0)

    kmax = jnp.max(key, axis=1)  # [T, C]
    eq = key == kmax[:, None, :]
    cnt = jnp.sum(eq.astype(jnp.float32), axis=1)
    neg = jnp.float32(-jnp.inf)
    pooled = jnp.max(jnp.where(eq, y, neg), axis=1)

    pooled_ref[...] = pooled.astype(pooled_ref.dtype)
    kmax_ref[...] = kmax
    cnt_ref[...] = cnt


def _pick_tile(r: int, k: int, c: int) -> int | None:
    """Largest divisor of r keeping the f32 block under ~8 MB.  Mosaic
    requires the output block's sublane dim to be a multiple of 8 OR equal
    to the array dim, so t is a multiple of 8 unless the whole array fits
    in one block."""
    row = k * c * 4
    for t in (256, 128, 64, 32, 16, 8):
        if r % t == 0 and t * row <= 8 * 1024 * 1024:
            return t
    if r * row <= 8 * 1024 * 1024:
        return r  # single whole-array block (any r)
    return None


def poolkey_eligible(shape: tuple, axis: int) -> bool:
    """The fused forward handles pooling over the PENULTIMATE axis of an
    f32 tensor whose channel dim is lane-aligned; everything the keys mode
    dispatches today (SA grouped stacks, global-pool heads) satisfies this
    except sub-128-channel final layers (MSG scale 1), which keep the XLA
    chain."""
    ndim = len(shape)
    if axis != ndim - 2 and axis - ndim != -2:
        return False
    k, c = shape[-2], shape[-1]
    r = 1
    for d in shape[:-2]:
        r *= d
    return c % 128 == 0 and k % 8 == 0 and _pick_tile(r, k, c) is not None


@functools.partial(jax.jit, static_argnums=(5, 6))
def bn_relu_exactkey_pool(z32, gamma, beta, mean, var,
                          cdtype=jnp.bfloat16, interpret: bool = False):
    """Fused keys-mode final activation + pool over axis -2.

    z32 [..., K, C] f32 (Dense output, bias included); gamma/beta/mean/var
    [C] f32 (training batch statistics, computed by the caller).  Returns
    (pooled [..., C] in ``cdtype``, pooled_key [..., C] f32, cnt [..., C]
    f32).  Pooled is bit-equal to the unfused chain in interpret mode; ON
    HARDWARE it differs by 1 bf16 ulp on ~26% of elements (Mosaic rsqrt/
    FMA precision — see the module docstring), one reason the kernel is
    an opt-in experiment.
    """
    *lead, k, c = z32.shape
    r = 1
    for d in lead:
        r *= d
    t = _pick_tile(r, k, c)
    zr = z32.reshape(r, k, c)
    grid = (r // t,)
    out = pl.pallas_call(
        functools.partial(_kernel, cdtype=cdtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, c), cdtype),
            jax.ShapeDtypeStruct((r, c), jnp.float32),
            jax.ShapeDtypeStruct((r, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zr, gamma[None], beta[None], mean[None], var[None])
    pooled, kmax, cnt = out
    return (
        pooled.reshape(*lead, c),
        kmax.reshape(*lead, c),
        cnt.reshape(*lead, c),
    )
