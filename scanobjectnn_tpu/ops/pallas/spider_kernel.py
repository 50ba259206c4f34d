"""Fused SpiderConv Pallas kernel: gather + Taylor outer product + conv matmul.

Behavioral reference: SpiderCNN/utils/tf_util.py:127-236 — spiderConv forms,
for every edge (i, k), the outer product of the gathered neighbor features
feat[idx[i,k]] (C channels) with the learned Taylor response g[i,k] (T
channels), then convolves the flattened [K, C, T] neighborhood with a [1, K]
conv to O output channels.  Algebraically:

    out[b,n,o] = sum_{k,c,t} feat[b, idx[b,n,k], c] * g[b,n,k,t] * W[k,c,t,o]

The XLA formulation (models/spidercnn.py fused=False) gathers [B,N,K,C]
through HBM and feeds an outer-product einsum into a Dense over the K*C*T
axis; measured on v5e the per-layer gather+scatter alone costs ~8-9 ms
fwd+bwd at B32/N1024/k20 REGARDLESS of C, and the [B,N,K*C*T] operand
traffic does the rest — 82.8 ms/step total.  A first fused attempt that
looped over the K neighbor slots (one one-hot gather + one [C, T*O] matmul
per slot) was still 12-15 ms/layer fwd+bwd: twenty small dependent
MXU/VPU rounds per program are latency-bound, not throughput-bound.

The design that wins phrases the WHOLE layer as a handful of large dense
ops per (batch, point-tile) program — no per-neighbor loop anywhere:

  onehot = (iota == idx_flat)                # [tile*K, N], ALL slots at once
  gath   = onehot @ feat                     # one MXU gather for all K
  gkc    = gath.reshape(tile, K*C)           # row-major: a free relayout
  for t in T (=5, static):                   # the only small loop
    g_exp = g[:, :, t] @ E                   # E = kron(I_K, 1_C): block-
                                             # broadcast each g column over
                                             # its C-block, as a matmul
    out  += (gkc * g_exp) @ W_t              # W_t: [K*C, O] slab of W

Backward reuses the same shapes (custom VJP; no gradient to idx, matching
the reference's NoGradient grouping ops):
  dgkc  = sum_t g_exp_t * (dout @ W_t^T)
  dfeat = onehot^T @ dgkc.reshape(tile*K, C)  (2-term bf16 split scatter,
          f32 VMEM accumulation — same convention as ops.pallas.edge_kernel)
  dg_t  = (gkc * (dout @ W_t^T)) @ E^T        (the same E sums each C-block)
  dW_t += (gkc * g_exp_t)^T @ dout            (revisiting accumulation over
                                               grid (T, B, tiles))
The forward saves the gathered features (bf16 [B, N*K, C]) so backward
never repeats the gather.

Precision: the gather one-hot matmul is exact on bf16-rounded values (1.0
times a bf16 term), and every conv matmul runs bf16 x bf16 with f32
accumulation — the same operand rounding XLA's Dense applies on TPU.

Layout rules honored (CLAUDE.md): g rides as [B, T, N, K] so no block ever
lane-pads the T=5 axis; W slabs pad O to a 128-lane boundary so t-slices
stay aligned; idx rides pre-flattened [B, N*K] so the batched one-hot needs
no in-kernel transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanobjectnn_tpu.ops.pallas.onehot import (
    _flat_gather_impl,
    _flat_scatter_impl,
    _interpret,
)

__all__ = ["spider_conv", "spider_conv_pallas", "spider_conv_lax"]


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_BUDGET = 14 * 1024 * 1024


def _mix_tile(n: int, k: int, c_pad: int, o_pad: int, t_ch: int,
              bytes_per_kc_elem: int = 12) -> int:
    """Point tile for the mix/dmix/dw kernels (resident W + transients +
    double-buffered io blocks; the factor is per-kernel, measured against
    Mosaic's 16M scoped-vmem accounting)."""
    w_bytes = t_ch * k * c_pad * o_pad * 2
    for tile in (128, 64, 32, 16, 8):
        if n % tile:
            continue
        transients = tile * k * c_pad * bytes_per_kc_elem + tile * o_pad * 12
        if w_bytes + transients < _VMEM_BUDGET:
            return tile
    return 8


def _kron_ones(k: int, c_pad: int) -> jnp.ndarray:
    """E = kron(I_K, ones(1, C)) built from iotas: [K, K*C] bf16."""
    row = lax.broadcasted_iota(jnp.int32, (k, k * c_pad), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k * c_pad), 1)
    return (row == col // c_pad).astype(jnp.bfloat16)


def _bmm(a, b, contract=((1,), (0,))):
    return lax.dot_general(
        a, b, dimension_numbers=(contract, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mix_kernel(gkc_ref, g_ref, w_ref, out_ref, *, t_ch: int, o_pad: int):
    """out = sum_t (gkc * g_exp_t) @ W_t — the Taylor outer product and the
    conv contraction, VMEM-resident."""
    gkc = gkc_ref[0]  # [tile, K*C] bf16
    k = g_ref[0, 0].shape[-1]
    c_pad = gkc.shape[-1] // k
    e = _kron_ones(k, c_pad)
    acc = jnp.zeros(out_ref[0].shape, jnp.float32)
    for t in range(t_ch):
        g_exp = _bmm(g_ref[0, t].astype(jnp.bfloat16), e)  # [tile, K*C]
        prod = gkc * g_exp.astype(jnp.bfloat16)
        acc += _bmm(prod, w_ref[t])  # [tile, O_pad]
    out_ref[0] = acc


def _dmix_kernel(gkc_ref, g_ref, w_ref, dout_ref, dgkc_ref, dg_ref,
                 *, t_ch: int, o_pad: int):
    gkc = gkc_ref[0]  # [tile, K*C] bf16
    k = g_ref[0, 0].shape[-1]
    c_pad = gkc.shape[-1] // k
    e = _kron_ones(k, c_pad)
    dout = dout_ref[0].astype(jnp.bfloat16)  # [tile, O_pad]
    dgkc = jnp.zeros(gkc.shape, jnp.float32)
    for t in range(t_ch):
        dprod = _bmm(dout, w_ref[t], contract=((1,), (1,)))  # [tile, K*C]
        g_exp = _bmm(g_ref[0, t].astype(jnp.bfloat16), e)
        dgkc += dprod * g_exp
        p = gkc.astype(jnp.float32) * dprod
        # dg_t: sum each C-block — the same E pattern, transposed.
        dg_ref[0, t] = _bmm(p.astype(jnp.bfloat16), e, contract=((1,), (1,)))
    dgkc_ref[0] = dgkc


def _dw_kernel(g_ref, dout_ref, gkc_ref, dw_ref, *, k: int, o_pad: int):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])

    gkc = gkc_ref[0]  # [tile, K*C] bf16
    c_pad = gkc.shape[-1] // k
    e = _kron_ones(k, c_pad)
    g_exp = _bmm(g_ref[0, 0].astype(jnp.bfloat16), e)  # [tile, K*C]
    prod = gkc * g_exp.astype(jnp.bfloat16)
    dw_ref[0] = dw_ref[0] + _bmm(
        prod, dout_ref[0].astype(jnp.bfloat16), contract=((0,), (0,))
    )  # [K*C, O_pad]


def _prep(feat, idx, g, kernel, t_ch: int):
    """Pad C to sublane and O to lane boundaries; reorder operands."""
    b, n, c = feat.shape
    k = idx.shape[-1]
    o = kernel.shape[-1]
    c_pad = _ceil_to(c, 8)
    o_pad = _ceil_to(o, 128)
    featp = jnp.pad(feat.astype(jnp.float32), ((0, 0), (0, 0), (0, c_pad - c)))
    idxf = idx.astype(jnp.int32).reshape(b, n * k)  # point-major, slot-minor
    g_t = jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2))  # [B, T, N, K]
    w = kernel.astype(jnp.float32).reshape(k, c, t_ch, o)
    w = jnp.pad(w, ((0, 0), (0, c_pad - c), (0, 0), (0, o_pad - o)))
    # [T, K*C_pad, O_pad] slabs, bf16 (the Dense matmul rounds to bf16 too).
    w = jnp.transpose(w, (2, 0, 1, 3)).reshape(t_ch, k * c_pad, o_pad)
    return featp, idxf, g_t, w.astype(jnp.bfloat16), c_pad, o_pad


def _spider_fwd(feat, idx, g, kernel, interpret: bool = False):
    b, n, c = feat.shape
    k = idx.shape[-1]
    t_ch = g.shape[-1]
    o = kernel.shape[-1]
    featp, idxf, g_t, w, c_pad, o_pad = _prep(feat, idx, g, kernel, t_ch)
    gath = _flat_gather_impl(featp, idxf, exact=False, interpret=interpret)
    tile = _mix_tile(n, k, c_pad, o_pad, t_ch, bytes_per_kc_elem=12)
    # [B, N*K, C] -> [B, N, K*C]: row-major bitcast, free in XLA.
    gkc = gath.reshape(b, n, k * c_pad)
    out = pl.pallas_call(
        functools.partial(_mix_kernel, t_ch=t_ch, o_pad=o_pad),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k * c_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_ch, tile, k), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_ch, k * c_pad, o_pad), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, o_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, o_pad), jnp.float32),
        interpret=interpret,
    )(gkc, g_t, w)
    return out[..., :o], (idxf, g_t, gkc, w)


def _spider_bwd_impl(idxf, g_t, gkc, w, dout, c: int, o: int,
                     t_ch: int, interpret: bool = False):
    b, n, kc = gkc.shape
    k = g_t.shape[-1]
    c_pad = kc // k
    o_pad = w.shape[-1]
    # dmix holds dgkc/dprod/g_exp/p in f32 alongside gkc — bigger footprint.
    tile = _mix_tile(n, k, c_pad, o_pad, t_ch, bytes_per_kc_elem=30)
    doutp = jnp.pad(dout.astype(jnp.float32), ((0, 0), (0, 0), (0, o_pad - o)))

    dgkc, dg_t = pl.pallas_call(
        functools.partial(_dmix_kernel, t_ch=t_ch, o_pad=o_pad),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, kc), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_ch, tile, k), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_ch, kc, o_pad), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, o_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, kc), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_ch, tile, k), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, kc), jnp.float32),
            jax.ShapeDtypeStruct((b, t_ch, n, k), jnp.float32),
        ),
        interpret=interpret,
    )(gkc, g_t, w, doutp)
    dg = jnp.transpose(dg_t, (0, 2, 3, 1))  # [B, N, K, T]

    dfeat = _flat_scatter_impl(
        idxf, dgkc.reshape(b, n * k, c_pad), n, interpret
    )[..., :c]

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, k=k, o_pad=o_pad),
        grid=(t_ch, b, n // tile),
        in_specs=[
            pl.BlockSpec((1, 1, tile, k), lambda t, i, j: (i, t, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, o_pad), lambda t, i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, kc), lambda t, i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kc, o_pad), lambda t, i, j: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_ch, kc, o_pad), jnp.float32),
        interpret=interpret,
    )(g_t, doutp, gkc)
    # [T, K*C_pad, O_pad] -> Dense layout [(k, c, t), o].
    dkernel = jnp.transpose(
        dw.reshape(t_ch, k, c_pad, o_pad), (1, 2, 0, 3)
    )[:, :c, :, :o].reshape(k * c * t_ch, o)

    return dfeat, dg, dkernel


@jax.custom_vjp
def spider_conv_pallas(feat, idx, g, kernel):
    """Fused spiderConv contraction (no bias):

        out[b,n,o] = sum_{k,c,t} feat[b, idx[b,n,k], c] * g[b,n,k,t]
                                 * kernel[(k*C + c)*T + t, o]

    Args:
      feat:   [B, N, C] float — per-point input features.
      idx:    [B, N, K] int32 — neighbor indices (no gradient).
      g:      [B, N, K, T] float — Taylor response per edge.
      kernel: [K*C*T, O] float — the Dense kernel over the flattened
              (k, c, t) axis (models/spidercnn.py order).

    Returns [B, N, O] float32.  Differentiable w.r.t. feat, g, kernel.
    """
    out, _ = _spider_fwd(feat, idx, g, kernel, interpret=_interpret())
    return out


def _sc_fwd(feat, idx, g, kernel):
    out, res = _spider_fwd(feat, idx, g, kernel, interpret=_interpret())
    idxf, g_t, gkc, w = res
    return out, (idxf, g_t, gkc, w, feat, g, kernel)


def _sc_bwd(saved, dout):
    idxf, g_t, gkc, w, feat, g, kernel = saved
    dfeat, dg, dkernel = _spider_bwd_impl(
        idxf, g_t, gkc, w, dout,
        c=feat.shape[-1], o=kernel.shape[-1], t_ch=g.shape[-1],
        interpret=_interpret(),
    )
    return (
        dfeat.astype(feat.dtype),
        None,
        dg.astype(g.dtype),
        dkernel.astype(kernel.dtype),
    )


spider_conv_pallas.defvjp(_sc_fwd, _sc_bwd)


def spider_conv_lax(feat, idx, g, kernel):
    """Reference XLA composition: gather + outer product + flattened matmul
    (differentiable in feat, g, kernel; the parity oracle for the kernel)."""
    from scanobjectnn_tpu.ops.grouping import batched_index_gather

    b, n, k = idx.shape
    c = feat.shape[-1]
    t_ch = g.shape[-1]
    grouped = batched_index_gather(feat, idx)  # [B, N, K, C]
    prod = jnp.einsum("bnkc,bnkt->bnkct", grouped, g)
    return jnp.einsum(
        "bnf,fo->bno", prod.reshape(b, n, k * c * t_ch), kernel,
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)


def spider_conv(feat, idx, g, kernel):
    """Backend-dispatching fused spiderConv (see spider_conv_pallas)."""
    from scanobjectnn_tpu.ops.fps import _use_pallas

    n = feat.shape[1]
    if _use_pallas() and n >= 256 and n % 8 == 0 and idx.shape[1] == n:
        return spider_conv_pallas(feat, idx, g, kernel)
    return spider_conv_lax(feat, idx, g, kernel)
