"""Merged-pass Pallas backward for ``grouped_bn_mlp_pool`` (satrain_kernel).

Training-mode BN couples all rows through its batch statistics, so layer
i's backward needs GLOBAL sums S1_i = Σ du_i, S2_i = Σ du_i·ẑ_i, and du_i
depends on dz_{i+1} — strictly sequential down the stack.  Round 4 ran one
pass per layer (L+1 passes total) and measured the recompute chain's f32
elementwise work as the dominant cost (docs/KERNELS.md "The SA training
backward").  This round implements the ALGEBRAIC MERGE that KERNELS.md
sketched: expand the next layer's global sums one level through the BN
backward's linear form, so ONE pass resolves TWO layers of scalars:

  dz_i = coef_i ⊙ (du_i − S1_i/R − ẑ_i·S2_i/R),  coef_i = rγ_i
  S1_{i-1}[c] = Σ_r gate_{i-1}[r,c] · (dz_i @ W^T)[r,c]
             = Σ_{c'} W̃[c,c']·(A[c,c'] − S1n_i[c']·g[c] − S2n_i[c']·B[c,c'])

with W̃ = W ⊙ coef_i[None, :] and the CROSS-MOMENTS — computable in the
same pass as S1_i/S2_i because they do not touch the unknown scalars:

  A  = gate_{i-1}^T @ du_i          B  = gate_{i-1}^T @ ẑ_i
  A2 = (gate⊙ẑ)_{i-1}^T @ du_i      B2 = (gate⊙ẑ)_{i-1}^T @ ẑ_i
  g  = Σ gate_{i-1}                 g2 = Σ (gate⊙ẑ)_{i-1}

(S2_{i-1} takes the A2/B2/g2 row.)  The tiny [C, C'] contractions that
finish the resolution run between passes in XLA.  Expanding a SECOND
level would need third-order moments (Σ gate_a⊗gate_b⊗du_c — a [C,C,C]
tensor costing C× the whole pass), so two layers per pass is the limit;
pass count drops from L+1 to ceil(L/2)+1 — for the 3-layer MLPs every SA
module uses, 4 → 3 passes, each pass being one full forward recompute of
f32 elementwise work plus (first pass) four [rows, C]^T-style moment
matmuls that ride the MXU.

Pass p recomputes the forward chain from the z1 block inside VMEM (no
[B, M, K, C] tensor ever crosses HBM between forward and backward), walks
the gradient chain down through layers whose scalars earlier passes
resolved, and emits: direct sums for its target layer (+ the moment
blocks for the layer below), any dW_i/db_i whose dz_i became computable
this pass, and — final pass — the dz1 tiles.

The math mirrors satrain_kernel._bwd_xla term for term (the parity
oracle).  Dtypes mirror the unfused stack: matmul operands in z1.dtype,
f32 accumulation and BN/pool/tie logic in f32 always.

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


def _pass_kernel(*refs, feats, k, tile, sums_j, moment_j, emit_dw, final,
                 r_count, bf16, pool_f32):
    """One backward pass; see module docstring for the per-pass contract.

    refs: z1 block (1,T,K,C0), d_pooled block (1,T,C_last), per-layer
    [mean, var, gamma, beta] rows (1,C_i), per-dense [W (C_i,C_{i+1}),
    b (1,C_{i+1})], known [S1_i, S2_i] rows for resolved layers i
    descending (all i > sums_j; every layer when final), then the outputs
    in the order: sums (8,C_j) | gg (8,C_mj), A, B, A2, B2 | per emit_dw
    descending: dW_i, db_i | dz1.
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
    lo = 0 if final else sums_j + 1
    known = {}
    for i in range(n_layers - 1, lo - 1, -1):
        known[i] = (refs[pos], refs[pos + 1]); pos += 2
    outs = list(refs[pos:])

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    rows = tile * k
    c0 = feats[0]
    cl = feats[-1]
    rcount = jnp.float32(r_count)

    def cd(a):
        return a.astype(jnp.bfloat16) if bf16 else a

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = jnp.zeros_like(ref)

        ref[...] = ref[...] + val

    def acc_rows(ref, r0, r1):
        @pl.when(first)
        def _():
            ref[...] = jnp.zeros_like(ref)

        ref[0:1, :] = ref[0:1, :] + r0[None, :]
        ref[1:2, :] = ref[1:2, :] + r1[None, :]

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
        if (not final) and i == sums_j:
            acc_rows(outs[0], jnp.sum(du, axis=0),
                     jnp.sum(du * zhats[i], axis=0))
            if moment_j is not None:
                gate = jnp.where(signs[moment_j], 1.0, 0.0)
                gz = gate * zhats[moment_j]
                zh_i = zhats[i]
                acc_rows(outs[1], jnp.sum(gate, axis=0), jnp.sum(gz, axis=0))

                def mom(lhs, rhs):
                    return lax.dot_general(
                        lhs, rhs, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C_mj, C_j]

                acc(outs[2], mom(gate, du))
                acc(outs[3], mom(gate, zh_i))
                acc(outs[4], mom(gz, du))
                acc(outs[5], mom(gz, zh_i))
            break
        s1k, s2k = known[i]
        _, var_r, gamma_r, _ = stats[i]
        coef = lax.rsqrt(var_r[0] + _EPS) * gamma_r[0]
        dz = coef * (du - s1k[0] / rcount - zhats[i] * (s2k[0] / rcount))
        if i in emit_dw:
            # outs layout: [sums]? [gg,A,B,A2,B2]? then (dW,db) pairs in
            # DESCENDING i order, then [dz1]? — compute this pair's slot.
            offset = (0 if final else 1) + (
                5 if moment_j is not None else 0
            )
            slot = offset + 2 * sorted(emit_dw, reverse=True).index(i)
            acc(outs[slot], lax.dot_general(
                ys[i - 1].astype(jnp.float32), dz,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            acc_rows(outs[slot + 1], jnp.sum(dz, axis=0),
                     jnp.zeros((feats[i],), jnp.float32))
        if final and i == 0:
            dz1_ref = outs[-1]
            dz1_ref[0] = dz.reshape(tile, k, c0).astype(dz1_ref.dtype)
            break
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
    """Dispatch the merged-pass Pallas backward (ceil(L/2)+1 passes);
    returns the same cotangent tuple as satrain_kernel._bwd_xla."""
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

    # ---- pass plan: two layers of scalars per pass ----
    plan = []  # (sums_j, moment_j or None)
    j = n_layers - 1
    while j >= 0:
        mj = j - 1 if j - 1 >= 0 else None
        plan.append((j, mj))
        j -= 1 if mj is None else 2
    # dW_i assignment: the first pass whose walk has dz_i computable
    # (i.e. every layer >= i already resolved before the pass starts).
    dw_pass = {}
    resolved_before = 0  # layers resolved counting from the top
    resolved_sets = []
    resolved = set()
    for (sj, mj) in plan:
        resolved_sets.append(set(resolved))
        resolved.add(sj)
        if mj is not None:
            resolved.add(mj)
    resolved_sets.append(set(resolved))  # before the final pass
    for i in range(1, n_layers):
        for p_idx in range(1, len(plan) + 1):
            if all(x in resolved_sets[p_idx] for x in range(i, n_layers)):
                dw_pass.setdefault(p_idx, []).append(i)
                break

    known = {}
    dws = [None] * (n_layers - 1)
    dbs = [None] * (n_layers - 1)

    def known_io(lo):
        inputs, specs = [], []
        for i in range(n_layers - 1, lo - 1, -1):
            for s in known[i]:
                arr = s[None, :]
                inputs.append(arr)
                specs.append(_whole(arr))
        return inputs, specs

    for p_idx, (sj, mj) in enumerate(plan):
        known_inputs, known_specs = known_io(sj + 1)
        emit_dw = tuple(dw_pass.get(p_idx, []))
        out_specs = [pl.BlockSpec(
            (8, feats[sj]), lambda i, jj: (0, 0), memory_space=pltpu.VMEM
        )]
        out_shape = [jax.ShapeDtypeStruct((8, feats[sj]), jnp.float32)]
        if mj is not None:
            out_specs.append(pl.BlockSpec(
                (8, feats[mj]), lambda i, jj: (0, 0),
                memory_space=pltpu.VMEM,
            ))
            out_shape.append(jax.ShapeDtypeStruct((8, feats[mj]), jnp.float32))
            for _ in range(4):  # A, B, A2, B2
                out_specs.append(pl.BlockSpec(
                    (feats[mj], feats[sj]), lambda i, jj: (0, 0),
                    memory_space=pltpu.VMEM,
                ))
                out_shape.append(
                    jax.ShapeDtypeStruct((feats[mj], feats[sj]), jnp.float32)
                )
        for i in sorted(emit_dw, reverse=True):
            out_specs += [
                pl.BlockSpec((feats[i - 1], feats[i]), lambda a, bb: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, feats[i]), lambda a, bb: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape += [
                jax.ShapeDtypeStruct((feats[i - 1], feats[i]), jnp.float32),
                jax.ShapeDtypeStruct((8, feats[i]), jnp.float32),
            ]
        kernel = functools.partial(
            _pass_kernel, feats=feats, k=k, tile=tile, sums_j=sj,
            moment_j=mj, emit_dw=emit_dw, final=False, r_count=r_count,
            bf16=bf16, pool_f32=pool_f32,
        )
        outs = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[z1_spec, dp_spec] + const_specs + known_specs,
            out_specs=tuple(out_specs), out_shape=tuple(out_shape),
            compiler_params=params, interpret=interpret,
        )(z1, d_pooled, *const_inputs, *known_inputs)
        outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
        known[sj] = (outs[0][0], outs[0][1])
        pos = 1
        if mj is not None:
            gg = outs[pos]; pos += 1
            momA, momB, momA2, momB2 = outs[pos:pos + 4]; pos += 4
            # Resolve layer mj's sums from the moments (XLA, tiny).
            coef = jax.lax.rsqrt(
                jnp.asarray(variances[sj], jnp.float32) + _EPS
            ) * jnp.asarray(gammas[sj], jnp.float32)
            wt = jnp.asarray(ws[mj], jnp.float32) * coef[None, :]
            s1n = known[sj][0] / r_count
            s2n = known[sj][1] / r_count
            ws1n = wt @ s1n
            s1_mj = jnp.sum(wt * (momA - momB * s2n[None, :]), axis=1) - (
                gg[0] * ws1n
            )
            s2_mj = jnp.sum(wt * (momA2 - momB2 * s2n[None, :]), axis=1) - (
                gg[1] * ws1n
            )
            known[mj] = (s1_mj, s2_mj)
        for i in sorted(emit_dw, reverse=True):
            dws[i - 1] = outs[pos]
            dbs[i - 1] = outs[pos + 1][0]
            pos += 2

    # ---- final pass: dz1 tiles (+ any dW not yet emitted) ----
    known_inputs, known_specs = known_io(0)
    emit_dw = tuple(dw_pass.get(len(plan), []))
    out_specs, out_shape = [], []
    for i in sorted(emit_dw, reverse=True):
        out_specs += [
            pl.BlockSpec((feats[i - 1], feats[i]), lambda a, bb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, feats[i]), lambda a, bb: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((feats[i - 1], feats[i]), jnp.float32),
            jax.ShapeDtypeStruct((8, feats[i]), jnp.float32),
        ]
    out_specs.append(pl.BlockSpec(
        (1, tile, k, c0), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    ))
    out_shape.append(jax.ShapeDtypeStruct((b, m, k, c0), z1.dtype))
    kernel = functools.partial(
        _pass_kernel, feats=feats, k=k, tile=tile, sums_j=-1, moment_j=None,
        emit_dw=emit_dw, final=True, r_count=r_count, bf16=bf16,
        pool_f32=pool_f32,
    )
    outs = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[z1_spec, dp_spec] + const_specs + known_specs,
        out_specs=tuple(out_specs), out_shape=tuple(out_shape),
        compiler_params=params, interpret=interpret,
    )(z1, d_pooled, *const_inputs, *known_inputs)
    outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
    pos = 0
    for i in sorted(emit_dw, reverse=True):
        dws[i - 1] = outs[pos]
        dbs[i - 1] = outs[pos + 1][0]
        pos += 2
    dz1 = outs[-1]

    dgammas = tuple(known[i][1] for i in range(n_layers))
    dbetas = tuple(known[i][0] for i in range(n_layers))
    return dz1, dgammas, dbetas, tuple(dws), tuple(dbs)
