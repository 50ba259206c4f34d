"""Batched one-hot gather/scatter primitives: the MXU row-movement engine.

On v5e, XLA's row gathers run ~30 GB/s effective and scatter-adds worse;
phrasing them as one-hot matmuls rides the MXU instead (BENCHMARKS.md).
The earlier per-slot kernels (ops/pallas/edge_kernel.py round loops) issue
one small matmul per neighbor slot and are LATENCY-bound; these kernels
batch every slot of a point tile into ONE [tile*K, N] one-hot and ONE
matmul, reaching MXU throughput.

Index layout: callers pass indices flattened [B, M] (any mix of point/slot
axes, row-major); a trailing singleton is added internally so the (B) axis
stays out of the block's last-two dims (Mosaic divisibility rule).

  flat_gather(vals, idxf, exact=True)  -> out[b, m, :] = vals[b, idxf[b, m], :]
  flat_scatter(idxf, upd, n)           -> out[b, j, :] = sum_{m: idxf=j} upd[b, m, :]

`exact=True` gathers full-f32 values via the 3-term bf16 Dekker split
(each term exact: 1.0 x bf16, f32 accumulation); `exact=False` gathers
bf16-rounded values in a single pass (what a following bf16 matmul would
round to anyway) and returns bf16.  Scatter uses the 2-term split
(~17 mantissa bits) — the gradient-precision convention shared with
ops.pallas.edge_kernel.

Gradients: flat_gather is differentiable in `vals` (VJP = flat_scatter);
flat_scatter is linear in `upd` (VJP = flat_gather) — both registered via
custom VJPs so compositions (e.g. the fused spiderConv) chain for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flat_gather", "flat_scatter"]

# bf16 terms per exact-split matmul: 3 x 8 mantissa bits ~ f32 (24 bits).
_SPLIT_TERMS = 3
# Cotangent scatters use 2 terms (~17 mantissa bits): gradient-precision
# ample, saves one MXU pass (measured on the edge kernels).
_SCATTER_TERMS = 2


def _interpret() -> bool:
    # Interpret mode off-TPU: the Pallas paths (incl. custom VJPs) stay
    # testable on the CPU suite.
    return jax.default_backend() != "tpu"


def _pick_tile(n: int, biggest: int = 128) -> int:
    cands = [c for c in (256, 128, 64, 32, 16, 8) if c <= biggest]
    for cand in cands:
        if n % cand == 0:
            return cand
    return n


def _bf16_split(v: jnp.ndarray, terms: int = _SPLIT_TERMS) -> list[jnp.ndarray]:
    parts = []
    rem = v
    for _ in range(terms):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    return parts


def _bf16_pack(v: jnp.ndarray, terms: int = _SPLIT_TERMS) -> jnp.ndarray:
    """Split into bf16 terms packed side-by-side: [N, C] -> [N, terms*C].

    IN-KERNEL (Mosaic) USE ONLY: the astype-based residual is folded to
    identity by XLA's excess-precision rule when traced at the jit level
    (the residual terms silently become zero).  Outside a Pallas kernel use
    :func:`bf16_pack_traced`."""
    parts = _bf16_split(v, terms)
    return parts[0] if terms == 1 else jnp.concatenate(parts, axis=-1)


def bf16_pack_traced(v: jnp.ndarray, terms: int = _SPLIT_TERMS) -> jnp.ndarray:
    """XLA-level (outside-kernel) exact bf16 term packing.

    Rounds via ``lax.reduce_precision`` (same round-to-nearest-even as an
    f32→bf16 convert, but opaque to --xla_allow_excess_precision folding,
    which turns ``x - x.astype(bf16).astype(f32)`` into ``x - x`` under jit
    — measured bf16-level 7.6e-3 error; see ballquery_kernel._split_and_tri)."""
    parts = []
    rem = v
    for _ in range(terms - 1):
        r = jax.lax.reduce_precision(rem, 8, 7)
        parts.append(r.astype(jnp.bfloat16))
        rem = rem - r
    parts.append(rem.astype(jnp.bfloat16))
    return parts[0] if terms == 1 else jnp.concatenate(parts, axis=-1)


def _split_matmul(onehot_bf16, packed_rhs, c: int, transpose: bool = False) -> jnp.ndarray:
    """Exact one-hot gather/scatter: ONE matmul against the packed bf16
    terms, term-columns summed in f32 after.  An MXU matmul narrower than
    128 output columns costs the same cycles as a 128-wide one, so at C=64
    packing turns 3 half-wide passes into 2 full-wide ones (and the 2-term
    scatter into 1)."""
    dims = (((0,), (0,)), ((), ())) if transpose else (((1,), (0,)), ((), ()))
    packed = lax.dot_general(
        onehot_bf16, packed_rhs, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    terms = packed.shape[-1] // c
    out = packed[..., :c]
    for i in range(1, terms):
        out = out + packed[..., i * c : (i + 1) * c]
    return out

_VMEM_BUDGET = 14 * 1024 * 1024


def _row_tile(m: int, n: int, c_pad: int, terms: int) -> int:
    """Rows per program: the one-hot [rows, N] is the dominant transient."""
    for rows in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if m % rows:
            continue
        onehot = rows * n * 2
        # [rows, 1] idx blocks lane-pad to 128 int32s (double-buffered).
        idx_bytes = rows * 128 * 4 * 2
        io = n * c_pad * terms * 2 * 2 + rows * c_pad * 8 + idx_bytes
        if onehot + io < _VMEM_BUDGET:
            return rows
    return 8


def _gather_kernel(vals_ref, idxf_ref, out_ref, *, exact: bool):
    n = vals_ref[0].shape[0]
    rows = idxf_ref[0].shape[0]
    idxf = idxf_ref[0]  # [rows, 1]
    col = lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    onehot = (col == idxf).astype(jnp.bfloat16)
    if exact:
        packed = _bf16_pack(vals_ref[0].astype(jnp.float32), _SPLIT_TERMS)
        out_ref[0] = _split_matmul(onehot, packed, out_ref[0].shape[-1])
    else:
        out_ref[0] = lax.dot_general(
            onehot, vals_ref[0].astype(jnp.bfloat16),
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)


def _scatter_kernel(idxf_ref, upd_ref, out_ref, *, n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    rows = idxf_ref[0].shape[0]
    idxf = idxf_ref[0]
    col = lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    onehot = (col == idxf).astype(jnp.bfloat16)
    out_ref[0] = out_ref[0] + _split_matmul(
        onehot, _bf16_pack(upd_ref[0].astype(jnp.float32), _SCATTER_TERMS),
        out_ref[0].shape[-1], transpose=True,
    )


def _pad_c(x):
    c = x.shape[-1]
    c_pad = ((c + 7) // 8) * 8
    if c_pad == c:
        return x, c
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, c_pad - c),)), c


def _flat_gather_impl(vals, idxf, exact: bool, interpret: bool):
    b, n, _ = vals.shape
    m = idxf.shape[1]
    valsp, c = _pad_c(vals.astype(jnp.float32))
    c_pad = valsp.shape[-1]
    rows = _row_tile(m, n, c_pad, _SPLIT_TERMS if exact else 1)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, exact=exact),
        grid=(b, m // rows),
        in_specs=[
            pl.BlockSpec((1, n, c_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, c_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, m, c_pad), jnp.float32 if exact else jnp.bfloat16
        ),
        # Headroom above the 16 MB default scoped limit: _row_tile's budget
        # model undercounts Mosaic's stack by a hair at wide-C shapes (the
        # MSG SA2 gather tripped the limit by 8 KB); v5e VMEM is 128 MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(valsp, idxf.astype(jnp.int32).reshape(b, m, 1))
    return out[..., :c] if c_pad != c else out


def _flat_scatter_impl(idxf, upd, n: int, interpret: bool):
    b, m = idxf.shape[:2]
    updp, c = _pad_c(upd.astype(jnp.float32))
    c_pad = updp.shape[-1]
    rows = _row_tile(m, n, c_pad, _SCATTER_TERMS)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n=n),
        grid=(b, m // rows),
        in_specs=[
            pl.BlockSpec((1, rows, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, c_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(idxf.astype(jnp.int32).reshape(b, m, 1), updp)
    return out[..., :c] if c_pad != c else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def flat_gather(vals, idxf, exact: bool = True):
    """out[b, m, :] = vals[b, idxf[b, m], :] — MXU one-hot gather.

    vals [B, N, C] float, idxf [B, M] int32 (M a multiple of 8).
    exact=True returns full-f32 values; exact=False returns bf16-rounded.
    Differentiable in vals."""
    return _flat_gather_impl(vals, idxf, exact, _interpret())


def _fg_fwd(vals, idxf, exact):
    return flat_gather(vals, idxf, exact), (idxf, vals.shape[1], vals.dtype)


def _fg_bwd(exact, res, dout):
    idxf, n, dt = res
    return _flat_scatter_impl(idxf, dout, n, _interpret()).astype(dt), None


flat_gather.defvjp(_fg_fwd, _fg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def flat_scatter(idxf, upd, n: int):
    """out[b, j, :] = sum over {m: idxf[b,m]==j} of upd[b, m, :] — MXU
    one-hot scatter-add (2-term bf16 split, f32 VMEM accumulation).

    idxf [B, M] int32, upd [B, M, C] float → [B, N, C] f32.
    Differentiable in upd."""
    return _flat_scatter_impl(idxf, upd, n, _interpret())


def _fs_fwd(idxf, upd, n):
    return flat_scatter(idxf, upd, n), (idxf, upd.dtype)


def _fs_bwd(n, res, dout):
    idxf, dt = res
    # d(upd) = exact (3-term) gather of dout rows.  The gather has no
    # 2-term mode, and its 1-term exact=False path is single-pass bf16 —
    # coarser than the 2-term scatter gradient convention — so exact wins
    # here at the cost of one extra MXU pass.
    return None, _flat_gather_impl(dout, idxf, True, _interpret()).astype(dt)


flat_scatter.defvjp(_fs_fwd, _fs_bwd)
