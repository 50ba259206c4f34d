"""Fused eval-time SA layer: neighbor gather + folded-BN MLP + max-pool.

Reference semantics: /root/reference/pointnet2/utils/pointnet_util.py:87-154
(pointnet_sa_module): a conv2d stack over grouped neighborhoods followed by a
max pool over the nsample axis.  The XLA formulation materializes every
inter-layer [B, M, K, C] activation in HBM — measured 2.89 ms (SA1) +
3.91 ms (feature gather) + 4.06 ms (SA2) of the B=128 headline forward, all
HBM-bound on those round trips (~80% HBM utilization for SA1).  This kernel
runs the ENTIRE chain per query tile inside VMEM and writes only the pooled
[B, M, C_out] output, so the activation traffic disappears.

Formulation (per program = one batch element x one query tile of T rows;
neighbor slots processed in chunks of KC, collapsed into the row dimension
so every matmul is a BIG one — the first per-slot formulation ran the whole
chain as K tiny [T,C]x[C,C] matmuls and only tied XLA, 8.71 vs 7.92 ms on
the B=128 headline):

  for chunk in range(K // KC):                 # few (<=8) unrolled chunks
      oh   = (idx[chunk] == iota_N)            # [KC*T, N] one-hot    (VPU)
      g    = oh @ src_packed                   # [KC*T, C_src] gather (MXU)
      h    = relu(g @ W0f + gxyz[chunk] @ W0x + b0)   # folded-BN layer 0
      h    = relu(h @ Wi + bi)  ...            # remaining layers
      acc  = maximum(acc, max_over_KC(h))      # running max-pool
  out[tile] = acc

Key layout choices (Mosaic rules, see docs/KERNELS.md):
  * idx and grouped_xyz arrive K-MAJOR ([B, K, M, *]) so a KC-chunk slice is
    a static leading-dim read whose [KC, T, *] -> [KC*T, *] collapse is
    layout-preserving (T is a multiple of the 8-sublane tile; the trailing
    lane dim is untouched).
  * KC is sized so KC*T rows ~ 2048: big enough that the per-layer matmuls
    run at the streaming MXU rate, small enough that the one-hot block and
    intermediate activations stay a few MB of VMEM.
  * f32 sources gather exactly via the 3-term bf16 Dekker split
    (ops.pallas.onehot conventions); bf16 sources in a single pass.

BatchNorm is eval-mode (running stats), i.e. a per-channel affine, folded
into the Dense weights by the caller (fold_bn_mlp_params):
  relu(BN(x @ W + b)) == relu(x @ (W*s) + (b*s + t)),
  s = gamma/sqrt(var+eps), t = beta - mean*s.
Training-mode BN needs batch statistics across the whole [B, M, K] set and
keeps the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanobjectnn_tpu.ops.pallas.onehot import bf16_pack_traced, _split_matmul

__all__ = ["sa_mlp_pool", "fold_bn_mlp_params"]


def fold_bn_mlp_params(params, batch_stats, n_layers: int, eps: float = 1e-3):
    """Fold eval-mode BatchNorm into the Dense kernels of an nn.layers.MLP
    param tree (dense_i / bn_i): returns (weights, biases) lists in f32."""
    weights, biases = [], []
    for i in range(n_layers):
        w = jnp.asarray(params[f"dense_{i}"]["kernel"], jnp.float32)
        b = jnp.asarray(params[f"dense_{i}"]["bias"], jnp.float32)
        if batch_stats is not None:
            gamma = jnp.asarray(params[f"bn_{i}"]["scale"], jnp.float32)
            beta = jnp.asarray(params[f"bn_{i}"]["bias"], jnp.float32)
            mean = jnp.asarray(batch_stats[f"bn_{i}"]["mean"], jnp.float32)
            var = jnp.asarray(batch_stats[f"bn_{i}"]["var"], jnp.float32)
            s = gamma * lax.rsqrt(var + eps)
            w = w * s[None, :]
            b = b * s + (beta - mean * s)
        weights.append(w)
        biases.append(b)
    return weights, biases


def _samlp_kernel(*refs, k, feats, has_src, has_xyz, src_c, cdtype):
    """refs order: [gxyz?], [idx?, srcp?], W0x?, W0f or W0, b0, W1, b1, ...,
    out.  All weight refs are whole-array blocks."""
    pos = 0
    gxyz_ref = None
    if has_xyz:
        gxyz_ref = refs[pos]; pos += 1
    idx_ref = srcp_ref = None
    if has_src:
        idx_ref = refs[pos]; pos += 1
        srcp_ref = refs[pos]; pos += 1
    w0x_ref = None
    if has_xyz and has_src:
        w0x_ref = refs[pos]; pos += 1
    w0_ref = refs[pos]; pos += 1
    b0_ref = refs[pos]; pos += 1
    wb = refs[pos : pos + 2 * (len(feats) - 1)]
    out_ref = refs[-1]

    tile = out_ref.shape[1]
    # Largest divisor of k keeping the collapsed row count ~<= 2048.
    kc = 1
    for cand in range(1, k + 1):
        if k % cand == 0 and cand * tile <= 2048:
            kc = cand
    rows = kc * tile
    acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
    if has_src:
        srcp = srcp_ref[0]  # [N, terms*src_c] bf16
        iota_n = lax.broadcasted_iota(jnp.int32, (rows, srcp.shape[0]), 1)

    for chunk in range(k // kc):
        # Layer-0 inputs for this slot chunk, collapsed to [KC*T, *]
        # sublane-major (leading-dim merge is layout-preserving).
        h = None
        if has_src:
            idxk = idx_ref[0, chunk * kc : (chunk + 1) * kc].reshape(rows, 1)
            oh = (iota_n == idxk).astype(jnp.bfloat16)  # [KC*T, N]
            g = _split_matmul(oh, srcp, src_c)  # [KC*T, src_c] f32 exact
            h = jnp.dot(
                g.astype(cdtype), w0_ref[...],
                preferred_element_type=jnp.float32,
            )
        if has_xyz:
            gx = gxyz_ref[0, chunk * kc : (chunk + 1) * kc].reshape(rows, 3)
            wx = w0x_ref[...] if w0x_ref is not None else w0_ref[...]
            hx = jnp.dot(
                gx.astype(cdtype), wx, preferred_element_type=jnp.float32
            )
            h = hx if h is None else h + hx
        h = jnp.maximum(h + b0_ref[0], 0.0)
        for i in range(len(feats) - 1):
            w_ref, b_ref = wb[2 * i], wb[2 * i + 1]
            h = jnp.dot(
                h.astype(cdtype), w_ref[...], preferred_element_type=jnp.float32
            )
            h = jnp.maximum(h + b_ref[0], 0.0)
        acc = jnp.maximum(acc, jnp.max(h.reshape(kc, tile, feats[-1]), axis=0))
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _sa_mlp_pool_call(gxyz_km, idx_km, src, weights_and_biases, out_dtype_arr,
                      feats: tuple, interpret: bool):
    b = (gxyz_km if gxyz_km is not None else idx_km).shape[0]
    k = (gxyz_km if gxyz_km is not None else idx_km).shape[1]
    m = (gxyz_km if gxyz_km is not None else idx_km).shape[2]
    has_xyz = gxyz_km is not None
    has_src = src is not None
    cdtype = out_dtype_arr.dtype
    tile = m
    for cand in (128, 64, 32, 16, 8):
        if m % cand == 0:
            tile = cand
            break

    inputs, in_specs = [], []
    if has_xyz:
        inputs.append(gxyz_km)
        in_specs.append(pl.BlockSpec(
            (1, k, tile, 3), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
        ))
    src_c = 0
    if has_src:
        inputs.append(idx_km)
        in_specs.append(pl.BlockSpec(
            (1, k, tile, 1), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
        ))
        src_c = weights_and_biases[1].shape[0] if has_xyz else \
            weights_and_biases[0].shape[0]
        if src.dtype == jnp.bfloat16:
            srcp = src
        else:
            # Built at trace level (outside the kernel): must round via
            # reduce_precision or XLA folds the residual terms to zero.
            srcp = bf16_pack_traced(src.astype(jnp.float32))
        inputs.append(srcp)
        n = src.shape[1]
        cp = srcp.shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, n, cp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ))
    for wab in weights_and_biases:
        arr = wab.astype(cdtype) if wab.ndim == 2 else wab.astype(jnp.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        inputs.append(arr)
        shp = arr.shape
        in_specs.append(pl.BlockSpec(
            shp, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM
        ))

    kernel = functools.partial(
        _samlp_kernel, k=k, feats=feats, has_src=has_src, has_xyz=has_xyz,
        src_c=src_c, cdtype=cdtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, m // tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, feats[-1]), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, feats[-1]), cdtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    return out


def sa_mlp_pool(
    grouped_xyz: jnp.ndarray | None,
    idx: jnp.ndarray | None,
    src_feats: jnp.ndarray | None,
    weights: list,
    biases: list,
    dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather + folded-BN MLP + max-pool over the neighbor axis.

    grouped_xyz: [B, M, K, 3] centered neighborhood coords (or None when
      use_xyz=False); idx: [B, M, K] int32 into src_feats (or None when the
      layer has no point features); src_feats: [B, N, C].  weights/biases:
      folded per-layer Dense params (fold_bn_mlp_params).  Layer-0 weight
      rows follow the SSG concat order [xyz(3), feats(C)].
    Returns pooled [B, M, feats[-1]] in ``dtype``.
    """
    has_xyz = grouped_xyz is not None
    has_src = src_feats is not None and idx is not None
    assert has_xyz or has_src
    feats = tuple(int(w.shape[1]) for w in weights)

    wab = []
    w0 = weights[0]
    if has_xyz and has_src:
        wab.append(w0[:3])   # W0x
        wab.append(w0[3:])   # W0f
    else:
        wab.append(w0)
    wab.append(biases[0])
    for w, b_ in zip(weights[1:], biases[1:]):
        wab.append(w)
        wab.append(b_)

    gxyz_km = None
    if has_xyz:
        gxyz_km = jnp.transpose(
            grouped_xyz.astype(jnp.float32), (0, 2, 1, 3)
        )  # [B, K, M, 3]
    idx_km = None
    src = None
    if has_src:
        idx_km = jnp.transpose(idx.astype(jnp.int32), (0, 2, 1))[..., None]
        src = src_feats.astype(
            jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
        )
    out_dtype_arr = jnp.zeros((), dtype)
    return _sa_mlp_pool_call(
        gxyz_km, idx_km, src, tuple(wab), out_dtype_arr, feats, interpret
    )
