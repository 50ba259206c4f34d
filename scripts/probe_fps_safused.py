#!/usr/bin/env python
"""Cripple-probe decomposition of the headline's two fused programs
(round-3 VERDICT items 2 + 3), at the exact bench.py shapes (B=128,
N=2048, bf16 MLP weights):

  * safused (ops/pallas/safused_kernel.py) at SA1 (M=512, K=32, feats
    (64,64,128), xyz-only) and SA2 (M=128, K=64, feats (128,128,256),
    src C=128): per-term marginals via crippled kernel variants — the
    edge_reduce methodology (docs/KERNELS.md "Measured decomposition").
  * FPS (ops/pallas/fps_kernel.py): npoint curve (per-round marginal +
    intercept) and per-term variants (no-coords, no-extraction, d-only).

The crippled kernels below are probe-only COPIES of the production kernels
with term switches; they exist to attribute wall time, not to compute
anything meaningful.  Timing methodology matches bench.py (serial
fori_loop chain in one jit, host scalar readback, best of 3).

Usage: python scripts/probe_fps_safused.py [fps|sa1|sa2|all]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanobjectnn_tpu.ops.pallas.ballquery_kernel import (
    _rank_inclusive,
    _split_and_tri,
)
from scanobjectnn_tpu.ops.pallas.onehot import _split_matmul, bf16_pack_traced

B = 128
# Two-point iteration counts: one chained jit call pays a fixed ~24-37 ms
# host dispatch + readback on this tunneled TPU (a no-op chain costs ~37 ms
# at ANY iteration count), so dividing a single call by its iteration count
# inflates every row by ~C/n (+0.9 ms at n=30 — the round-3 probe tables
# carried exactly this artifact; it is why an XLA transpose "measured"
# 0.92 ms when its true cost is ~5 us).  The slope between a 30- and a
# 300-iteration chain cancels the fixed term.
ITERS_LO, ITERS_HI = 30, 300


def timed(name, f, *args):
    def chain_secs(iters):
        @jax.jit
        def chain(*a):
            def body(i, carry):
                a0, acc = carry
                out = jnp.sum(f(a0, *a[1:]).astype(jnp.float32))
                return jax.tree.map(
                    lambda t: t * (1.0 + 1e-20 * out).astype(t.dtype), a0
                ), acc + out

            a0, acc = lax.fori_loop(0, iters, body, (a[0], jnp.float32(0)))
            tail = sum(
                jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(a0)
            )
            return acc + tail * 0e0

        float(chain(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    slope = max(
        (chain_secs(ITERS_HI) - chain_secs(ITERS_LO)) / (ITERS_HI - ITERS_LO),
        0.0,
    )
    print(f"{name:58s} {slope * 1e3:8.3f} ms", flush=True)
    return slope * 1e3


# --------------------------------------------------------------------------
# safused cripple variants.  Mode ladder (each adds one term):
#   base      inputs streamed, zero outputs          -> launch + input DMA
#   rank      + d2, hit test, rank cumsum            -> selection front-end
#   slotsnp   + K slot-extraction matmuls, no pad    -> extraction MXU
#   slots     + padding selects (first-hit/empty)    -> padding VPU
#   nogather  + full MLP on coords only (skip src)   -> MLP matmuls
#   full      + one-hot src gather (SA2)             -> feature gather
# For SA1 (no src features) nogather == full.
# --------------------------------------------------------------------------


def _probe_kernel(
    xyz_ref, new_xyz_ref, split_ref, tri_ref, *refs,
    radius, nsample, feats, has_src, src_c, cdtype, mode,
):
    pos = 0
    srcp_ref = None
    if has_src:
        srcp_ref = refs[pos]; pos += 1
    w0x_ref = None
    if has_src:
        w0x_ref = refs[pos]; pos += 1
        w0f_ref = refs[pos]; pos += 1
    else:
        w0f_ref = None
        w0x_ref = refs[pos]; pos += 1
    b0_ref = refs[pos]; pos += 1
    wb = refs[pos : pos + 2 * (len(feats) - 1)]
    out_ref = refs[-1]

    x = xyz_ref[0, 0, :][None, :]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    q = new_xyz_ref[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    n = x.shape[-1]
    tile = q.shape[0]

    if mode == "base":
        # Touch every input so the DMA is not dead-code-eliminated.
        s = (jnp.sum(x) + jnp.sum(q) + jnp.sum(split_ref[...].astype(jnp.float32))
             + jnp.sum(tri_ref[...].astype(jnp.float32)))
        if has_src:
            s = s + jnp.sum(srcp_ref[...].astype(jnp.float32))
        out_ref[0] = jnp.full((tile, feats[-1]), s, out_ref.dtype)
        return

    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2
    hit = d2 < radius * radius
    cnt_total = jnp.sum(hit.astype(jnp.int32), axis=1)
    rank = _rank_inclusive(hit, tri_ref[...])
    slot = jnp.where(hit, rank, jnp.float32(0.0))

    if mode == "rank":
        s = jnp.sum(slot, axis=1)[:, None] + cnt_total[:, None].astype(jnp.float32)
        out_ref[0] = (s * jnp.ones((1, feats[-1]), jnp.float32)).astype(out_ref.dtype)
        return

    split = split_ref[0]

    def slot_ext(kf):
        selb = jnp.where(slot == kf, 1.0, 0.0).astype(jnp.bfloat16)
        return lax.dot_general(
            selb, split, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    has = (cnt_total > 0)[:, None]
    e0 = slot_ext(jnp.float32(1.0))
    fx = jnp.where(has, e0[:, 0:1] + e0[:, 3:4] + e0[:, 6:7], x[0, 0])
    fy = jnp.where(has, e0[:, 1:2] + e0[:, 4:5] + e0[:, 7:8], y[0, 0])
    fz = jnp.where(has, e0[:, 2:3] + e0[:, 5:6] + e0[:, 8:9], z[0, 0])
    fi = jnp.where(has, e0[:, 9:10] + e0[:, 10:11], 0.0)
    cnt2 = cnt_total[:, None]

    def slot_vals(k, pad):
        e = slot_ext((k + 1) * jnp.float32(1.0))
        gx0 = e[:, 0:1] + e[:, 3:4] + e[:, 6:7]
        gy0 = e[:, 1:2] + e[:, 4:5] + e[:, 7:8]
        gz0 = e[:, 2:3] + e[:, 5:6] + e[:, 8:9]
        i0 = e[:, 9:10] + e[:, 10:11]
        if not pad:
            return jnp.concatenate([gx0 - qx, gy0 - qy, gz0 - qz], axis=1), \
                i0.astype(jnp.int32)
        v = k < cnt2
        gx = jnp.where(v, gx0, fx) - qx
        gy = jnp.where(v, gy0, fy) - qy
        gz = jnp.where(v, gz0, fz) - qz
        ik = jnp.where(v, i0, fi).astype(jnp.int32)
        return jnp.concatenate([gx, gy, gz], axis=1), ik

    if mode == "slotstk":
        # Stacked extraction: ONE [KC*T, N] one-hot matmul per KC-slot chunk
        # (the samlp feature-gather shape) instead of KC small [T, N]
        # matmuls — same MXU tile-steps, 1/KC the matmul launches.  No
        # padding (compare against slotsnp).
        kc = 1
        for cand in range(1, nsample + 1):
            if nsample % cand == 0 and cand * tile <= 2048:
                kc = cand
        rows = kc * tile
        acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
        slot_b = slot[None, :, :]  # [1, T, N]
        for chunk in range(nsample // kc):
            kvals = (
                chunk * kc + 1.0
                + lax.broadcasted_iota(jnp.int32, (kc, 1, 1), 0)
                .astype(jnp.float32)
            )  # [KC, 1, 1]; int32 iota (Mosaic cannot emit f32 iota)
            ohs = jnp.where(slot_b == kvals, 1.0, 0.0).astype(jnp.bfloat16)
            e = lax.dot_general(
                ohs.reshape(rows, n), split, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KC*T, 16]
            gx = e[:, 0:1] + e[:, 3:4] + e[:, 6:7]
            gy = e[:, 1:2] + e[:, 4:5] + e[:, 7:8]
            gz = e[:, 2:3] + e[:, 5:6] + e[:, 8:9]
            s = (gx + gy + gz).reshape(kc, tile, 1)
            acc = jnp.maximum(
                acc, jnp.max(s, axis=0) * jnp.ones((1, feats[-1]), jnp.float32)
            )
        out_ref[0] = acc.astype(out_ref.dtype)
        return

    if mode in ("stkfull", "stkpad", "stkpad2", "stkfull2"):
        # Stacked-extraction ladder:
        #   stkpad    + in-loop bcast padding, NO gather/MLP  (vs slotstk ->
        #               the padding term as first written)
        #   stkpad2   + padding with ALL loop-invariant broadcasts hoisted
        #               out of the chunk loop (fallbacks/query/count/iota
        #               are chunk-independent; Mosaic does not CSE them)
        #   stkfull   + padding (in-loop bcasts) + gather + MLP + pool
        #   stkfull2  + padding (hoisted) + gather + MLP + pool — the
        #               production-fix candidate, bit-exact semantics
        # No idx output in any (production carries a [K,T]->[T,K] relayout
        # on top).
        hoist = mode in ("stkpad2", "stkfull2")
        do_mlp_s = mode in ("stkfull", "stkfull2")
        kc = 1
        for cand in range(1, nsample + 1):
            if nsample % cand == 0 and cand * tile <= 2048:
                kc = cand
        rows = kc * tile
        acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
        cntf = cnt2.astype(jnp.float32)

        def bcast(t):
            return jnp.broadcast_to(t[None], (kc, tile, 1)).reshape(rows, 1)

        if hoist:
            iota_k = lax.broadcasted_iota(jnp.int32, (kc, tile, 1), 0).astype(
                jnp.float32
            ).reshape(rows, 1)
            CNT, FX, FY, FZ, FI = (bcast(t) for t in (cntf, fx, fy, fz, fi))
            QX, QY, QZ = bcast(qx), bcast(qy), bcast(qz)
        for chunk in range(nsample // kc):
            kf = (
                chunk * kc + 1.0
                + lax.broadcasted_iota(jnp.int32, (kc, 1, 1), 0)
                .astype(jnp.float32)
            )
            ohs = jnp.where(slot[None, :, :] == kf, 1.0, 0.0).astype(
                jnp.bfloat16
            )
            e = lax.dot_general(
                ohs.reshape(rows, n), split, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if hoist:
                v = (iota_k + float(chunk * kc)) < CNT
                gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], FX) - QX
                gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], FY) - QY
                gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], FZ) - QZ
                ik = jnp.where(v, e[:, 9:10] + e[:, 10:11], FI).astype(jnp.int32)
            else:
                v = jnp.broadcast_to(kf - 1.0, (kc, tile, 1)).reshape(
                    rows, 1
                ) < bcast(cntf)
                gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], bcast(fx)) - bcast(qx)
                gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], bcast(fy)) - bcast(qy)
                gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], bcast(fz)) - bcast(qz)
                ik = jnp.where(v, e[:, 9:10] + e[:, 10:11], bcast(fi)).astype(jnp.int32)
            if not do_mlp_s:
                s = (gx + gy + gz + ik.astype(jnp.float32) * 1e-9).reshape(
                    kc, tile, 1
                )
                acc = jnp.maximum(
                    acc,
                    jnp.max(s, axis=0) * jnp.ones((1, feats[-1]), jnp.float32),
                )
                continue
            h = None
            if has_src:
                iota_n = lax.broadcasted_iota(jnp.int32, (rows, n), 1)
                oh2 = (iota_n == ik).astype(jnp.bfloat16)
                g = _split_matmul(oh2, srcp_ref[0], src_c)
                h = jnp.dot(
                    g.astype(cdtype), w0f_ref[...],
                    preferred_element_type=jnp.float32,
                )
            c3 = jnp.concatenate([gx, gy, gz], axis=1)
            hx = jnp.dot(
                c3.astype(cdtype), w0x_ref[...],
                preferred_element_type=jnp.float32,
            )
            h = hx if h is None else h + hx
            h = jnp.maximum(h + b0_ref[0], 0.0)
            for i in range(len(feats) - 1):
                w_ref, b_ref = wb[2 * i], wb[2 * i + 1]
                h = jnp.dot(
                    h.astype(cdtype), w_ref[...],
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(h + b_ref[0], 0.0)
            acc = jnp.maximum(
                acc, jnp.max(h.reshape(kc, tile, feats[-1]), axis=0)
            )
        out_ref[0] = acc.astype(out_ref.dtype)
        return

    if mode == "stkmerge":
        # Stacked extraction whose one-hot is REUSED for the feature gather:
        # for a valid slot, (slot == k+1) and (iota_n == ik) are the SAME
        # one-hot (ik IS the index of the rank-(k+1) point), so the gather's
        # separate [rows, N] iota-compare build is redundant.  Invalid slots
        # extract zeros; their first-hit padding moves AFTER the row-linear
        # W0f matmul as one [rows, feats0] select against a broadcast
        # fallback row (bit-equal: a padded row's matmul output equals the
        # fallback row's matmul output).  Coords padding unchanged.
        kc = 1
        for cand in range(1, nsample + 1):
            if nsample % cand == 0 and cand * tile <= 2048:
                kc = cand
        rows = kc * tile
        f0 = feats[0]
        acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
        cntf = cnt2.astype(jnp.float32)

        def bcast(t):
            return jnp.broadcast_to(t[None], (kc, tile, 1)).reshape(rows, 1)

        srcp = srcp_ref[0]
        # Fallback features: first hit (== the slot-1 one-hot row), point 0
        # for empty balls — exactly what the padded-idx gather produces.
        oh1 = jnp.where(slot == 1.0, 1.0, 0.0).astype(jnp.bfloat16)
        g1 = _split_matmul(oh1, srcp, src_c)  # [T, src_c] f32 exact
        src0 = srcp[0:1]
        src0 = (src0[:, :src_c] + src0[:, src_c : 2 * src_c]
                + src0[:, 2 * src_c : 3 * src_c])
        gfb = jnp.where(has, g1, src0)
        hfb = jnp.dot(gfb.astype(cdtype), w0f_ref[...],
                      preferred_element_type=jnp.float32)  # [T, f0]
        HFB = jnp.broadcast_to(hfb[None], (kc, tile, f0)).reshape(rows, f0)

        for chunk in range(nsample // kc):
            kf = (
                chunk * kc + 1.0
                + lax.broadcasted_iota(jnp.int32, (kc, 1, 1), 0)
                .astype(jnp.float32)
            )
            ohs = jnp.where(slot[None, :, :] == kf, 1.0, 0.0).astype(
                jnp.bfloat16
            ).reshape(rows, n)
            e = lax.dot_general(
                ohs, split, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v = jnp.broadcast_to(kf - 1.0, (kc, tile, 1)).reshape(
                rows, 1
            ) < bcast(cntf)
            gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], bcast(fx)) - bcast(qx)
            gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], bcast(fy)) - bcast(qy)
            gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], bcast(fz)) - bcast(qz)
            g_raw = _split_matmul(ohs, srcp, src_c)  # zeros on invalid rows
            hf = jnp.where(
                v,
                jnp.dot(g_raw.astype(cdtype), w0f_ref[...],
                        preferred_element_type=jnp.float32),
                HFB,
            )
            c3 = jnp.concatenate([gx, gy, gz], axis=1)
            h = hf + jnp.dot(
                c3.astype(cdtype), w0x_ref[...],
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(h + b0_ref[0], 0.0)
            for i in range(len(feats) - 1):
                w_ref, b_ref = wb[2 * i], wb[2 * i + 1]
                h = jnp.dot(
                    h.astype(cdtype), w_ref[...],
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(h + b_ref[0], 0.0)
            acc = jnp.maximum(
                acc, jnp.max(h.reshape(kc, tile, feats[-1]), axis=0)
            )
        out_ref[0] = acc.astype(out_ref.dtype)
        return

    pad = mode not in ("slotsnp",)
    do_mlp = mode in ("nogather", "full")
    do_gather = mode == "full" and has_src

    def mlp_chunk(coords_k, idxs_k):
        kc = len(coords_k)
        rows = kc * tile
        if not do_mlp:
            # Pool the raw extracted coordinates (no MLP, no gather).
            s = sum(jnp.sum(c, axis=1, keepdims=True) for c in coords_k)
            return s * jnp.ones((1, feats[-1]), jnp.float32)
        h = None
        if do_gather:
            idxk = jnp.stack(idxs_k, axis=0).reshape(rows, 1)
            iota_n = lax.broadcasted_iota(jnp.int32, (rows, n), 1)
            oh = (iota_n == idxk).astype(jnp.bfloat16)
            g = _split_matmul(oh, srcp_ref[0], src_c)
            h = jnp.dot(
                g.astype(cdtype), w0f_ref[...],
                preferred_element_type=jnp.float32,
            )
        c3 = jnp.stack(coords_k, axis=0).reshape(rows, 3)
        hx = jnp.dot(
            c3.astype(cdtype), w0x_ref[...], preferred_element_type=jnp.float32
        )
        h = hx if h is None else h + hx
        h = jnp.maximum(h + b0_ref[0], 0.0)
        for i in range(len(feats) - 1):
            w_ref, b_ref = wb[2 * i], wb[2 * i + 1]
            h = jnp.dot(
                h.astype(cdtype), w_ref[...], preferred_element_type=jnp.float32
            )
            h = jnp.maximum(h + b_ref[0], 0.0)
        return jnp.max(h.reshape(kc, tile, feats[-1]), axis=0)

    acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
    vals = [slot_vals(k, pad) for k in range(nsample)]
    kc = 1
    for cand in range(1, nsample + 1):
        if nsample % cand == 0 and cand * tile <= 2048:
            kc = cand
    for chunk in range(nsample // kc):
        sl = slice(chunk * kc, (chunk + 1) * kc)
        acc = jnp.maximum(
            acc,
            mlp_chunk([c for c, _ in vals[sl]], [ik for _, ik in vals[sl]]),
        )
    out_ref[0] = acc.astype(out_ref.dtype)


def probe_sa(radius, nsample, n, m, feats, src_c, mode):
    """Build a jittable fn(points_tuple) -> scalar for one cripple mode."""
    key = jax.random.PRNGKey(0)
    cdtype = jnp.bfloat16
    has_src = src_c > 0

    def run(args):
        xyz, new_xyz, src = args[0], args[1], (args[2] if has_src else None)
        b = xyz.shape[0]
        tile = 128
        xyz_f = xyz.astype(jnp.float32)
        xyz_t = jnp.transpose(xyz_f, (0, 2, 1))
        split, tri, w = _split_and_tri(xyz_f, b, n)
        inputs = [xyz_t, new_xyz.astype(jnp.float32), split, tri]
        in_specs = [
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ]
        ws, bs = [], []
        kk = key
        prev = (3 + src_c) if has_src else 3
        for f in feats:
            kk = jax.random.fold_in(kk, f)
            ws.append(jax.random.normal(kk, (prev, f), jnp.float32) * 0.1)
            bs.append(jnp.zeros((f,), jnp.float32))
            prev = f
        if has_src:
            srcp = bf16_pack_traced(src.astype(jnp.float32))
            inputs.append(srcp)
            in_specs.append(pl.BlockSpec(
                (1, n, srcp.shape[-1]), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ))
            wab = [ws[0][:3].astype(cdtype), ws[0][3:].astype(cdtype)]
        else:
            wab = [ws[0].astype(cdtype)]
        wab.append(bs[0][None, :])
        for w_, b_ in zip(ws[1:], bs[1:]):
            wab += [w_.astype(cdtype), b_[None, :]]
        for arr in wab:
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(
                arr.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM
            ))
        kernel = functools.partial(
            _probe_kernel, radius=radius, nsample=nsample, feats=feats,
            has_src=has_src, src_c=src_c, cdtype=cdtype, mode=mode,
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
            interpret=os.environ.get("PROBE_INTERPRET") == "1",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*inputs)
        return jnp.sum(out.astype(jnp.float32))

    return run


def probe_sa_layers(which):
    from scanobjectnn_tpu import ops
    from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (B, 2048, 3), jnp.float32)
    _, new1 = ops.farthest_point_sample_with_coords(pts, 512)
    new1 = jax.block_until_ready(new1)
    feats1 = jax.random.normal(key, (B, 512, 128), jnp.float32)
    _, new2 = ops.farthest_point_sample_with_coords(new1, 128)
    new2 = jax.block_until_ready(new2)

    results = {}
    if which in ("sa1", "all"):
        print("--- SA1: N=2048 M=512 K=32 feats (64,64,128), xyz-only ---")
        for mode in ("base", "rank", "slotsnp", "slots", "nogather"):
            f = probe_sa(0.2, 32, 2048, 512, (64, 64, 128), 0, mode)
            results[f"sa1_{mode}"] = timed(f"SA1 [{mode}]", lambda a, f=f: f(a)[None], (pts, new1))

        # Production kernel for the ground-truth 'full' number.
        w1, b1 = [], []
        prev = 3
        for c in (64, 64, 128):
            w1.append(jax.random.normal(key, (prev, c), jnp.float32) * 0.1)
            b1.append(jnp.zeros((c,), jnp.float32))
            prev = c

        def sa1_full(a):
            f, _ = sa_ball_mlp_pool(0.2, 32, a[0], a[1], None, w1, b1,
                                    dtype=jnp.bfloat16)
            return jnp.sum(f.astype(jnp.float32))[None]

        results["sa1_full"] = timed("SA1 [full production]", sa1_full, (pts, new1))

    if which in ("sa2", "all"):
        print("--- SA2: N=512 M=128 K=64 feats (128,128,256), src C=128 ---")
        sa2_modes = ("base", "rank", "slotsnp", "slotstk", "slots",
                     "nogather", "full", "stkfull")
        if os.environ.get("PROBE_MODES"):
            sa2_modes = tuple(os.environ["PROBE_MODES"].split(","))
        for mode in sa2_modes:
            f = probe_sa(0.4, 64, 512, 128, (128, 128, 256), 128, mode)
            results[f"sa2_{mode}"] = timed(
                f"SA2 [{mode}]", lambda a, f=f: f(a)[None], (new1, new2, feats1)
            )

        w2, b2 = [], []
        prev = 131
        for c in (128, 128, 256):
            w2.append(jax.random.normal(key, (prev, c), jnp.float32) * 0.1)
            b2.append(jnp.zeros((c,), jnp.float32))
            prev = c

        def sa2_full(a):
            f, _ = sa_ball_mlp_pool(0.4, 64, a[0], a[1], a[2], w2, b2,
                                    dtype=jnp.bfloat16)
            return jnp.sum(f.astype(jnp.float32))[None]

        results["sa2_full"] = timed("SA2 [full production]", sa2_full,
                                    (new1, new2, feats1))
    return results


def probe_sa_nscaling():
    """N-scaling of the PRODUCTION fused SA layers (bucketing Stage A):
    if the program cost is ~linear in the contraction width N (as the
    total-MXU-work account predicts), restricting each query's contraction
    to a ~3/8 spatial neighborhood (grid bucketing) would cut SA1 by
    ~2.5x.  Timing-only (fewer hits per ball at small N is fine — the
    extraction is K slots regardless of hit count)."""
    from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
    from scanobjectnn_tpu.utils.chipbench import timed_ms

    key = jax.random.PRNGKey(2)

    def weights(shapes):
        ws, bs, kk = [], [], key
        for a, b in shapes:
            kk = jax.random.fold_in(kk, a * 1000 + b)
            ws.append(jax.random.normal(kk, (a, b), jnp.float32) * 0.1)
            bs.append(jnp.zeros((b,), jnp.float32))
        return ws, bs

    w1, b1 = weights([(3, 64), (64, 64), (64, 128)])
    w2, b2 = weights([(131, 128), (128, 128), (128, 256)])

    print("--- production fused SA1 (M=512 K=32), N-curve ---")
    for n in (768, 1024, 1536, 2048):
        pts = jax.random.normal(key, (B, n, 3), jnp.float32)
        q = pts[:, :512, :]

        def sa1(a):
            f, i = sa_ball_mlp_pool(0.2, 32, a[0], a[1], None, w1, b1,
                                    dtype=jnp.bfloat16)
            return (jnp.sum(f.astype(jnp.float32))
                    + jnp.sum(i.astype(jnp.float32)) * 1e-9)[None]

        timed_ms(sa1, (pts, q), name=f"SA1 N={n}")

    print("--- production fused SA2 (M=128 K=64, C=128), N-curve ---")
    for n in (192, 256, 384, 512):
        pts = jax.random.normal(key, (B, n, 3), jnp.float32)
        q = pts[:, :128, :]
        feats = jax.random.normal(key, (B, n, 128), jnp.float32)

        def sa2(a):
            f, i = sa_ball_mlp_pool(0.4, 64, a[0], a[1], a[2], w2, b2,
                                    dtype=jnp.bfloat16)
            return (jnp.sum(f.astype(jnp.float32))
                    + jnp.sum(i.astype(jnp.float32)) * 1e-9)[None]

        timed_ms(sa2, (pts, q, feats), name=f"SA2 N={n}")


def probe_sa2_scaling():
    """Discriminate WHERE SA2's extraction overhead lives (round-4 floor
    table: measured 16.6 us/program vs 5.3 us of MXU tile-steps).  The
    extraction is K independent [T, N] @ [N, 16] matmuls; its cost model is
    t = K * (per-slot fixed + N/128 * step) + base.  The K-curve at two Ns
    separates per-slot fixed cost (intercept slope) from contraction work
    (N-proportional slope)."""
    from scanobjectnn_tpu import ops

    key = jax.random.PRNGKey(3)
    pts = jax.random.normal(key, (B, 2048, 3), jnp.float32)
    _, new1 = ops.farthest_point_sample_with_coords(pts, 512)
    new1 = jax.block_until_ready(new1)
    _, new2 = ops.farthest_point_sample_with_coords(new1, 128)
    new2 = jax.block_until_ready(new2)
    pts1024 = jax.random.normal(key, (B, 1024, 3), jnp.float32)

    for n, cloud in ((512, new1), (1024, pts1024)):
        print(f"--- SA2-shape extraction K-curve (N={n} M=128, xyz-only, "
              "slotsnp - base marginals) ---")
        base = timed(
            f"N={n} [base]",
            lambda a, f=probe_sa(0.4, 16, n, 128, (128, 128, 256), 0,
                                 "base"): f(a)[None],
            (cloud, new2),
        )
        prev = None
        for k in (16, 32, 64):
            f = probe_sa(0.4, k, n, 128, (128, 128, 256), 0, "slotsnp")
            t = timed(f"N={n} K={k} [slotsnp]", lambda a, f=f: f(a)[None],
                      (cloud, new2))
            ext = t - base
            per_slot = ext / k / B * 1e3
            print(f"    extraction {ext:6.3f} ms = {per_slot:.3f} us/slot/program"
                  f" (MXU-step floor {n / 128 * 20.6 / 940:.3f})")
            if prev is not None:
                d = (t - prev[1]) / (k - prev[0]) / B * 1e3
                print(f"    marginal K {prev[0]}->{k}: {d:.3f} us/slot/program")
            prev = (k, t)


# --------------------------------------------------------------------------
# FPS probes
# --------------------------------------------------------------------------


def probe_fps():
    from scanobjectnn_tpu.ops.pallas.fps_kernel import (
        fps_pallas,
        fps_pallas_with_coords,
    )

    key = jax.random.PRNGKey(2)
    pts = jax.random.normal(key, (B, 2048, 3), jnp.float32)
    pts512 = jax.random.normal(key, (B, 512, 3), jnp.float32)

    print("--- FPS npoint curve (B=128, N=2048, with_coords) ---")
    prev = None
    for npoint in (64, 128, 256, 512):
        t = timed(
            f"fps_with_coords npoint={npoint}",
            lambda p, np_=npoint: fps_pallas_with_coords(p, np_)[0]
            .astype(jnp.float32).sum()[None],
            pts,
        )
        if prev is not None:
            d_np = npoint - prev[0]
            print(f"    marginal {prev[0]}->{npoint}: "
                  f"{(t - prev[1]) / d_np * 1e3:.2f} us/round")
        prev = (npoint, t)

    print("--- FPS variants at npoint=512 ---")
    timed("fps (no coords) npoint=512",
          lambda p: fps_pallas(p, 512).astype(jnp.float32).sum()[None], pts)
    timed("fps_with_coords N=512 npoint=128 (SA2 stage)",
          lambda p: fps_pallas_with_coords(p, 128)[0]
          .astype(jnp.float32).sum()[None], pts512)

    # Cripple kernels: measure the per-round terms.
    def mk(mode, npoint=512):
        def kern(xyz_ref, idx_ref, mind_ref, idx_t_ref):
            x = xyz_ref[:, 0, :]
            y = xyz_ref[:, 1, :]
            z = xyz_ref[:, 2, :]
            b, n = x.shape
            mind_ref[:, :] = jnp.full((b, n), 1e38, jnp.float32)
            idx_t_ref[0, :] = jnp.zeros((b,), jnp.int32)
            col = lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)

            def step(j, carry):
                x0, y0, z0 = carry
                d = (x - x0) ** 2 + (y - y0) ** 2 + (z - z0) ** 2
                mind = jnp.minimum(mind_ref[:, :], d)
                mind_ref[:, :] = mind
                if mode == "donly":
                    # No argmax/extraction: next "selection" is a running
                    # constant — measures the d+min VPU passes alone.
                    return (x0 + 1e-6, y0, z0)
                if mode in ("manargmax", "mannoext"):
                    # Manual two-reduce argmax: max, then lowest index where
                    # the max is attained (same first-occurrence tie rule) —
                    # probes whether jnp.argmax's Mosaic lowering leaves
                    # passes on the table.
                    m = jnp.max(mind, axis=1, keepdims=True)
                    best = jnp.min(
                        jnp.where(mind == m, col, n), axis=1
                    ).astype(jnp.int32)
                else:
                    best = jnp.argmax(mind, axis=1).astype(jnp.int32)
                idx_t_ref[pl.ds(j, 1), :] = best[None, :]
                if mode in ("noext", "mannoext"):
                    # Argmax but no one-hot coordinate extraction.
                    bf = best.astype(jnp.float32)[:, None]
                    return (x0 + 1e-9 * bf, y0, z0)
                onehot = (col == best[:, None]).astype(jnp.float32)
                nx = jnp.sum(x * onehot, axis=1, keepdims=True)
                ny = jnp.sum(y * onehot, axis=1, keepdims=True)
                nz = jnp.sum(z * onehot, axis=1, keepdims=True)
                return (nx, ny, nz)

            init = (x[:, 0:1], y[:, 0:1], z[:, 0:1])

            def body2(i, carry):
                return step(2 * i + 3, step(2 * i + 2, carry))

            lax.fori_loop(0, (npoint - 2) // 2, body2, step(1, init))
            idx_ref[:, :] = idx_t_ref[:, :].T

        @jax.jit
        def run(xyz):
            b, n, _ = xyz.shape
            xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
            idx = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((b, n), jnp.float32),
                    pltpu.VMEM((npoint, b), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
            )(xyz_t)
            return idx.astype(jnp.float32).sum()[None]

        return run

    print("--- FPS cripple terms (npoint curve per mode, no coords out) ---")
    fps_modes = ("donly", "noext", "fullstep")
    if os.environ.get("FPS_MODES"):
        fps_modes = tuple(os.environ["FPS_MODES"].split(","))
    for mode in fps_modes:
        prev = None
        for npoint in (64, 512):
            t = timed(f"fps cripple [{mode}] npoint={npoint}", mk(mode, npoint), pts)
            if prev is not None:
                print(f"    marginal: {(t - prev) / (npoint - 64) * 1e3:.2f} us/round")
            prev = t

    # Fixed-cost probes: the XLA transpose feeding the kernel, and the
    # kernel at npoint=2 (pure launch + DMA + scratch init).
    timed("xla transpose [B,N,3]->[B,3,N]",
          lambda p: jnp.transpose(p, (0, 2, 1)).sum()[None], pts)
    timed("fps cripple [fullstep] npoint=8 (launch+DMA)", mk("fullstep", 8), pts)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("fps", "all"):
        probe_fps()
    if which in ("sa1", "sa2", "all"):
        probe_sa_layers(which if which != "all" else "all")
    if which == "sa2k":
        probe_sa2_scaling()
    if which == "nscale":
        probe_sa_nscaling()


if __name__ == "__main__":
    main()
