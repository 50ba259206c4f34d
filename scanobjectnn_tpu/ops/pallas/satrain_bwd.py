"""Multi-pass Pallas backward for ``grouped_bn_mlp_pool`` (satrain_kernel).

L+1 passes over z1 tiles (grid = (batch, query-tile)); pass p recomputes the
forward chain from the z1 block inside VMEM (no [B, M, K, C] tensor ever
crosses HBM between forward and backward), walks the gradient chain down to
layer j = L-1-p using the BN global sums emitted by earlier passes, and
emits:

  * pass p < L:  S1_j = sum(du_j), S2_j = sum(du_j * zhat_j)  (= dbeta_j,
    dgamma_j), accumulated across ALL programs into one (8, C_j) block
    (rows 0/1; the TPU grid is sequential, so a constant-index output block
    stays VMEM-resident and accumulates exactly);
    plus, once dz_{j+1} is first computable this pass, dW_{j+1} (a whole
    [C_j, C_{j+1}] accumulated block) and db_{j+1}.
  * pass L (final): dz1 tiles, [B, M, K, C0].

The math mirrors satrain_kernel._bwd_xla term for term (the parity oracle);
see that module's docstring for the BN-backward derivation.  Dtypes mirror
the unfused stack: matmul operands in z1.dtype (bf16 pairs on the MXU when
training bf16), f32 accumulation and BN/pool/tie logic in f32 always (a
bf16 compare mask trips Mosaic relayout — docs/KERNELS.md ground rules).

Reference semantics being differentiated: the conv2d+BN(+relu)+reduce_max
stack of /root/reference/pointnet2/utils/pointnet_util.py:87-154.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanobjectnn_tpu.ops.pallas.onehot import _interpret

__all__ = ["bwd_pallas"]

_EPS = 1e-3


def _pass_kernel(*refs, feats, k, tile, emit_j, final, r_count, bf16,
                 pool_f32):
    """One backward pass; see module docstring for the per-pass contract.

    refs: z1 block (1,T,K,C0), d_pooled block (1,T,C_last), per-layer
    [mean, var, gamma, beta] rows (1,C_i), per-dense [W (C_i,C_{i+1}),
    b (1,C_{i+1})], known [S1_i, S2_i] rows for i descending (down to
    emit_j+1, or 0 when final), then the outputs.
    """
    n_layers = len(feats)
    pos = 0
    z1_ref = refs[pos]; pos += 1
    dpool_ref = refs[pos]; pos += 1
    stats = []
    for _ in range(n_layers):
        stats.append(tuple(refs[pos:pos + 4])); pos += 4
    wbs = []
    for _ in range(n_layers - 1):
        wbs.append((refs[pos], refs[pos + 1])); pos += 2
    lo = 0 if final else emit_j + 1
    known = {}
    for i in range(n_layers - 1, lo - 1, -1):
        known[i] = (refs[pos], refs[pos + 1]); pos += 2
    outs = refs[pos:]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    rows = tile * k
    c0 = feats[0]
    cl = feats[-1]
    rcount = jnp.float32(r_count)

    def cd(a):
        return a.astype(jnp.bfloat16) if bf16 else a

    # ---- forward recompute in VMEM (mirrors satrain_kernel._fwd_chain) ----
    z = z1_ref[0].reshape(rows, c0)
    zhats, ys, signs = [], [], []
    h = z
    for i in range(n_layers):
        mean_r, var_r, gamma_r, beta_r = stats[i]
        if i > 0:
            w_r, b_r = wbs[i - 1]
            h = jnp.dot(
                cd(ys[-1]), cd(w_r[...]), preferred_element_type=jnp.float32
            ) + b_r[0]
            # pool_f32: last layer's z stays f32 (see satrain_kernel).
            if not (pool_f32 and i == n_layers - 1):
                h = cd(h)
        hf = h.astype(jnp.float32)
        zhat = (hf - mean_r[0]) * lax.rsqrt(var_r[0] + _EPS)
        u = zhat * gamma_r[0] + beta_r[0]
        zhats.append(zhat)
        signs.append(u > 0.0)
        y = jnp.maximum(u, 0.0)
        # pool_f32: the final pre-pool layer stays f32 so the tie structure
        # matches satrain_kernel._fwd_chain (see _pool_f32's doc).
        ys.append(y if (pool_f32 and i == n_layers - 1) else cd(y))

    # ---- max-pool backward with even tie split (jnp.max's VJP) ----
    y3 = ys[-1].astype(jnp.float32).reshape(tile, k, cl)
    pooled = jnp.max(y3, axis=1)  # [T, cl]
    eq = (y3 == pooled[:, None, :]).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=1)
    dp = dpool_ref[0].astype(jnp.float32)  # [T, cl]
    dy = (eq * (dp / cnt)[:, None, :]).reshape(rows, cl)

    # ---- gradient chain down the stack ----
    i = n_layers - 1
    while True:
        du = jnp.where(signs[i], dy, 0.0)
        if (not final) and i == emit_j:
            sums_ref = outs[0]

            @pl.when(first)
            def _():
                sums_ref[...] = jnp.zeros_like(sums_ref)

            sums_ref[0:1, :] = sums_ref[0:1, :] + jnp.sum(du, axis=0)[None, :]
            sums_ref[1:2, :] = (
                sums_ref[1:2, :] + jnp.sum(du * zhats[i], axis=0)[None, :]
            )
            break
        s1k, s2k = known[i]
        _, var_r, gamma_r, _ = stats[i]
        coef = lax.rsqrt(var_r[0] + _EPS) * gamma_r[0]
        dz = coef * (du - s1k[0] / rcount - zhats[i] * (s2k[0] / rcount))
        if final and i == 0:
            dz1_ref = outs[0]
            dz1_ref[0] = dz.reshape(tile, k, c0).astype(dz1_ref.dtype)
            break
        if (not final) and i == emit_j + 1:
            dw_ref, db_ref = outs[1], outs[2]

            @pl.when(first)
            def _():
                dw_ref[...] = jnp.zeros_like(dw_ref)
                db_ref[...] = jnp.zeros_like(db_ref)

            dw_ref[...] = dw_ref[...] + lax.dot_general(
                ys[i - 1].astype(jnp.float32), dz,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_ref[0:1, :] = db_ref[0:1, :] + jnp.sum(dz, axis=0)[None, :]
        w_r, _ = wbs[i - 1]
        # dy_{i-1} = dz_i @ W_i^T (contract the output axis; no transpose).
        dy = lax.dot_general(
            dz, w_r[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        i -= 1


def _whole(arr):
    return pl.BlockSpec(arr.shape, lambda i, j: tuple([0] * arr.ndim),
                        memory_space=pltpu.VMEM)


def bwd_pallas(res, d_pooled):
    """Dispatch the L+1-pass Pallas backward; returns the same cotangent
    tuple as satrain_kernel._bwd_xla."""
    z1, gammas, betas, ws, bs, means, variances = res
    b, m, k, c0 = z1.shape
    n_layers = len(gammas)
    feats = tuple(int(g.shape[0]) for g in gammas)
    tile = 8
    for cand in (256, 128, 64, 32, 16, 8):
        if m % cand == 0 and cand * k <= 2048:
            tile = cand
            break
    r_count = float(b * m * k)
    bf16 = z1.dtype == jnp.bfloat16
    from scanobjectnn_tpu.ops.pallas.satrain_kernel import _pool_f32

    pool_f32 = _pool_f32()
    interpret = _interpret()
    grid = (b, m // tile)

    z1_spec = pl.BlockSpec(
        (1, tile, k, c0), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    dp_spec = pl.BlockSpec(
        (1, tile, feats[-1]), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    const_inputs, const_specs = [], []
    for i in range(n_layers):
        for a in (means[i], variances[i], gammas[i], betas[i]):
            arr = jnp.asarray(a, jnp.float32)[None, :]
            const_inputs.append(arr)
            const_specs.append(_whole(arr))
    for i in range(n_layers - 1):
        w = jnp.asarray(ws[i], jnp.float32)
        bb = jnp.asarray(bs[i], jnp.float32)[None, :]
        const_inputs += [w, bb]
        const_specs += [_whole(w), _whole(bb)]

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    known = {}
    dws = [None] * (n_layers - 1)
    dbs = [None] * (n_layers - 1)
    for p in range(n_layers):
        j = n_layers - 1 - p
        known_inputs, known_specs = [], []
        for i in range(n_layers - 1, j, -1):
            for s in known[i]:
                arr = s[None, :]
                known_inputs.append(arr)
                known_specs.append(_whole(arr))
        out_specs = [pl.BlockSpec(
            (8, feats[j]), lambda i, jj: (0, 0), memory_space=pltpu.VMEM
        )]
        out_shape = [jax.ShapeDtypeStruct((8, feats[j]), jnp.float32)]
        if j < n_layers - 1:
            out_specs += [
                pl.BlockSpec((feats[j], feats[j + 1]), lambda i, jj: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, feats[j + 1]), lambda i, jj: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((feats[j], feats[j + 1]), jnp.float32),
                jax.ShapeDtypeStruct((8, feats[j + 1]), jnp.float32),
            ]
        kernel = functools.partial(
            _pass_kernel, feats=feats, k=k, tile=tile, emit_j=j, final=False,
            r_count=r_count, bf16=bf16, pool_f32=pool_f32,
        )
        outs = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[z1_spec, dp_spec] + const_specs + known_specs,
            out_specs=tuple(out_specs), out_shape=tuple(out_shape),
            compiler_params=params, interpret=interpret,
        )(z1, d_pooled, *const_inputs, *known_inputs)
        outs = outs if isinstance(outs, (tuple, list)) else (outs,)
        known[j] = (outs[0][0], outs[0][1])
        if j < n_layers - 1:
            dws[j] = outs[1]
            dbs[j] = outs[2][0]

    # Final pass: dz1 tiles.
    known_inputs, known_specs = [], []
    for i in range(n_layers - 1, -1, -1):
        for s in known[i]:
            arr = s[None, :]
            known_inputs.append(arr)
            known_specs.append(_whole(arr))
    kernel = functools.partial(
        _pass_kernel, feats=feats, k=k, tile=tile, emit_j=-1, final=True,
        r_count=r_count, bf16=bf16, pool_f32=pool_f32,
    )
    dz1 = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[z1_spec, dp_spec] + const_specs + known_specs,
        out_specs=pl.BlockSpec(
            (1, tile, k, c0), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, k, c0), z1.dtype),
        compiler_params=params, interpret=interpret,
    )(z1, d_pooled, *const_inputs, *known_inputs)

    dgammas = tuple(known[i][1] for i in range(n_layers))
    dbetas = tuple(known[i][0] for i in range(n_layers))
    return dz1, dgammas, dbetas, tuple(dws), tuple(dbs)
