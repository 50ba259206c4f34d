"""Fully-fused eval-time SA layer: ball select + gather + MLP + max-pool.

Reference semantics: /root/reference/pointnet2/utils/pointnet_util.py:87-154
(sample_and_group + pointnet_sa_module): ball query (first-K-in-order,
tf_grouping_g.cu:3-36), centered neighborhood grouping, conv2d(1x1) stack,
max-pool over the neighbor axis.

This kernel goes one step past samlp_kernel.py (which fuses gather+MLP+pool
but still reads the ball-group kernel's [B, M, K] coordinate planes and
[B, M, K] indices back from HBM): the ball SELECTION itself runs in the same
program, so the grouped coordinates and indices never leave VMEM.  What the
two-kernel chain pays per SA layer and this kernel does not:

  * the ball kernel's 3x [B, M, K] f32 coord-plane writes + the XLA stack to
    [B, M, K, 3] + samlp's transpose to K-major + the block re-read
    (~25 MB x 4 at SA1 B=128 — measured ~0.9 ms of stack/transpose glue),
  * the [B, M, K] idx round trip (SA2's feature gather one-hots are rebuilt
    from idx that never left VMEM),
  * one full program launch per layer.

Selection is the proven rank-based form (ballquery_kernel.py): hit mask ->
block-triangular bf16 cumsum (_rank_inclusive) -> K INDEPENDENT per-slot
one-hot MXU matmuls against the packed bf16 coordinate/column split
(bit-exact f32 reconstruction, onehot.py convention).  Each slot's [T, 16]
extraction is padded (repeat first hit; point 0 when a row has no hits,
centered on the query) and stacked K-leading, so the [KC*T, 3] MLP rows
collapse layout-preserving exactly as in samlp_kernel.  MLP weights arrive
with eval-mode BatchNorm pre-folded (samlp_kernel.fold_bn_mlp_params).

K <= 64 runs fully-unrolled slots and still emits the [B, M, K] indices
(the SA module's public contract returns them; the write is ~2% of the
removed traffic).  Larger K (a multiple of 16 — MSG's 128) runs a
fori_loop over 16-slot unrolled chunks and returns idx=None: the traced
chunk base rules out the lane-offset idx store (lane-dim dynamic stores
are sublane-only), so callers that need idx keep K <= 64.
"""

from __future__ import annotations

import functools
import os

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

__all__ = ["sa_ball_mlp_pool"]


def _safused_kernel(
    xyz_ref, new_xyz_ref, split_ref, tri_ref, *refs,
    radius, nsample, feats, has_src, use_xyz, src_c, cdtype, prelifted,
    stacked,
):
    """refs order after the fixed four: [srcp?], W0x (use_xyz), W0f or W0
    (absent when prelifted: srcp already carries feats @ W0f), b0, W1, b1,
    ..., then outputs (out_ref, idx_ref)."""
    pos = 0
    srcp_ref = None
    if has_src:
        srcp_ref = refs[pos]; pos += 1
    w0x_ref = None
    if use_xyz and has_src and not prelifted:
        w0x_ref = refs[pos]; pos += 1
    w0_ref = refs[pos]; pos += 1
    b0_ref = refs[pos]; pos += 1
    wb = refs[pos : pos + 2 * (len(feats) - 1)]
    if nsample <= 64:
        out_ref, idx_ref = refs[-2], refs[-1]
    else:
        out_ref, idx_ref = refs[-1], None  # K>64 emits no idx (see below)
    # prelifted: w0_ref IS W0x (the only layer-0 matmul left in-kernel).

    x = xyz_ref[0, 0, :][None, :]  # [1, N]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    q = new_xyz_ref[0]  # [T, 3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    n = x.shape[-1]
    tile = q.shape[0]

    # ---- ball selection (identical math to _ball_group_kernel) ----
    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # [T, N]
    hit = d2 < radius * radius  # no-sqrt hit test (exact, see ballquery)
    cnt_total = jnp.sum(hit.astype(jnp.int32), axis=1)  # [T]
    rank = _rank_inclusive(hit, tri_ref[...])
    slot = jnp.where(hit, rank, jnp.float32(0.0))  # 1-based slot per hit

    split = split_ref[0]  # [N, 16] bf16 packed x0 y0 z0 x1 y1 z1 x2 y2 z2 c0 c1

    def slot_ext(kf):
        selb = jnp.where(slot == kf, 1.0, 0.0).astype(jnp.bfloat16)
        return lax.dot_general(
            selb, split, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 16]

    # Padding terms: repeat the first hit; zero-hit rows take point 0
    # (centered).  Everything stays 2-D [T, 1] lane slices so the K-leading
    # stacks below collapse layout-preserving (a [KC, T] -> [KC*T, 1]
    # reshape would move lanes into sublanes — a Mosaic relayout).
    has = (cnt_total > 0)[:, None]  # [T, 1]
    e0 = slot_ext(jnp.float32(1.0))
    fx = jnp.where(has, e0[:, 0:1] + e0[:, 3:4] + e0[:, 6:7], x[0, 0])
    fy = jnp.where(has, e0[:, 1:2] + e0[:, 4:5] + e0[:, 7:8], y[0, 0])
    fz = jnp.where(has, e0[:, 2:3] + e0[:, 5:6] + e0[:, 8:9], z[0, 0])
    fi = jnp.where(has, e0[:, 9:10] + e0[:, 10:11], 0.0)
    cnt2 = cnt_total[:, None]  # [T, 1]

    def slot_vals(k):
        """(coords [T, 3] centered padded, idx [T, 1] padded int32) for slot
        ``k`` (0-based; python int or traced scalar)."""
        e = slot_ext((k + 1) * jnp.float32(1.0))
        v = k < cnt2  # [T, 1]
        gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], fx) - qx
        gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], fy) - qy
        gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], fz) - qz
        c3 = jnp.concatenate([gx, gy, gz], axis=1)
        ik = jnp.where(v, e[:, 9:10] + e[:, 10:11], fi).astype(jnp.int32)
        return c3, ik

    # ---- folded-BN MLP + max-pool over one KC-slot chunk ----
    # (samlp_kernel formulation: collapse [KC, T, *] -> [KC*T, *] rows so
    # every matmul is big; KC keeps rows ~<= 2048 and bounds the one-hot.)
    if has_src:
        srcp = srcp_ref[0]  # [N, terms*src_c] bf16

    def mlp_rows(c3, idxk, kc):
        """[T, feats[-1]] max-pool over ``kc`` slots already merged to rows:
        c3 [kc*T, 3] centered coords, idxk [kc*T, 1] int32 padded indices."""
        rows = kc * tile
        h = None
        if has_src:
            iota_n = lax.broadcasted_iota(jnp.int32, (rows, n), 1)
            oh = (iota_n == idxk).astype(jnp.bfloat16)  # [KC*T, N]
            g = _split_matmul(oh, srcp, src_c)  # [KC*T, src_c] f32 exact
            if prelifted:
                h = g  # srcp already carries feats @ W0f (per-point lift)
            else:
                h = jnp.dot(
                    g.astype(cdtype), w0_ref[...],
                    preferred_element_type=jnp.float32,
                )
        if use_xyz or not has_src:
            wx = w0x_ref[...] if w0x_ref is not None else w0_ref[...]
            hx = jnp.dot(
                c3.astype(cdtype), wx, preferred_element_type=jnp.float32
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

    def mlp_chunk(coords_k, idxs_k):
        """mlp_rows over per-slot [T, 3] / [T, 1] lists (the unstacked
        form); the K-leading stack -> row merge is layout-preserving."""
        kc = len(coords_k)
        c3 = jnp.stack(coords_k, axis=0).reshape(kc * tile, 3)
        idxk = jnp.stack(idxs_k, axis=0).reshape(kc * tile, 1)
        return mlp_rows(c3, idxk, kc)

    def slot_vals_stacked(base, kc):
        """(coords [kc*T, 3] centered padded, idx [kc*T, 1] int32 padded)
        for slots base..base+kc-1 via ONE [kc*T, N] one-hot matmul (vs kc
        small [T, N] ones — same MXU tile-steps, 1/kc the matmul issues;
        the stacked one-hot is built by a single broadcast compare, NOT by
        concatenating per-slot one-hots, which is the sublane-copy cost
        that sank the round-3 stacked-8 variant).  ``base`` may be traced
        (the K > 64 chunk loop)."""
        # int32 iota then cast: Mosaic's tpu.iota cannot emit f32 directly.
        kf = base + 1.0 + lax.broadcasted_iota(
            jnp.int32, (kc, 1, 1), 0
        ).astype(jnp.float32)
        ohs = jnp.where(slot[None, :, :] == kf, 1.0, 0.0).astype(jnp.bfloat16)
        e = lax.dot_general(
            ohs.reshape(kc * tile, n), split, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [kc*T, 16]

        def bcast(t):  # [T, 1] -> [kc*T, 1], leading-dim merge
            return jnp.broadcast_to(t[None], (kc, tile, 1)).reshape(
                kc * tile, 1
            )

        v = jnp.broadcast_to(kf - 1.0, (kc, tile, 1)).reshape(
            kc * tile, 1
        ) < bcast(cnt2.astype(jnp.float32))
        gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], bcast(fx)) - bcast(qx)
        gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], bcast(fy)) - bcast(qy)
        gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], bcast(fz)) - bcast(qz)
        c3 = jnp.concatenate([gx, gy, gz], axis=1)
        ik = jnp.where(v, e[:, 9:10] + e[:, 10:11], bcast(fi)).astype(jnp.int32)
        return c3, ik

    acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
    kc = 1
    for cand in range(1, nsample + 1):
        if nsample % cand == 0 and cand * tile <= 2048:
            kc = cand
    if nsample <= 64 and stacked:
        # Stacked slots: one [kc*T, N] one-hot matmul per chunk.  idx comes
        # out slot-major ([kc*T, 1] rows); ONE [K, T] -> [T, K] relayout at
        # the end re-lanes it for the [B, M, K] contract.
        iks = []
        for chunk in range(nsample // kc):
            c3, ik = slot_vals_stacked(float(chunk * kc), kc)
            iks.append(ik)
            acc = jnp.maximum(acc, mlp_rows(c3, ik, kc))
        idx_ref[0, :, :] = (
            jnp.concatenate(iks, axis=0).reshape(nsample, tile).T
        )
    elif nsample <= 64:
        # Fully unrolled slots (best ILP, sane compile — the round-3 ball
        # kernel measurement); idx emitted for the SA-module contract.
        vals = [slot_vals(k) for k in range(nsample)]
        idx_ref[0, :, :] = jnp.concatenate([ik for _, ik in vals], axis=1)
        for chunk in range(nsample // kc):
            sl = slice(chunk * kc, (chunk + 1) * kc)
            acc = jnp.maximum(
                acc,
                mlp_chunk([c for c, _ in vals[sl]], [ik for _, ik in vals[sl]]),
            )
    elif stacked:
        # K > 64 (MSG): fori_loop over stacked 16-slot chunks; no idx
        # (same contract as the unstacked chunk path below).
        chunkw = 16

        def body_stk(j, acc):
            c3, ik = slot_vals_stacked(
                (j * chunkw).astype(jnp.float32), chunkw
            )
            return jnp.maximum(acc, mlp_rows(c3, ik, chunkw))

        acc = lax.fori_loop(0, nsample // chunkw, body_stk, acc)
    else:
        # K > 64: fori_loop over 16-slot unrolled chunks (a fully-unrolled
        # K=128 program explodes Mosaic compile time — the round-3 ball
        # kernel lesson).  The slot index is TRACED here, which is fine for
        # the extraction (slot == k+1 compare) and padding (k < cnt) but
        # rules out the idx store: a [T, K] lane-offset store at a traced
        # base is illegal (lane-dim dynamic stores are sublane-only), so
        # this path does not emit indices — callers that need idx (the SA
        # module contract) keep K <= 64; MSG's K=128 scales discard idx.
        chunkw = 16

        def body(j, acc):
            base = j * chunkw
            vals = [slot_vals(base + u) for u in range(chunkw)]
            return jnp.maximum(
                acc, mlp_chunk([c for c, _ in vals], [ik for _, ik in vals])
            )

        acc = lax.fori_loop(0, nsample // chunkw, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 6, 7, 8, 9, 10))
def _sa_ball_mlp_call(
    radius, nsample, xyz, new_xyz, src, weights_and_biases,
    feats: tuple, use_xyz: bool, prelifted: bool, stacked: bool,
    interpret: bool,
):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    has_src = src is not None
    cdtype = weights_and_biases[0].dtype
    tile = m
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if m % cand == 0:
            tile = cand
            break

    xyz_f = xyz.astype(jnp.float32)
    xyz_t = jnp.transpose(xyz_f, (0, 2, 1))  # [B, 3, N]
    split, tri, w = _split_and_tri(xyz_f, b, n)

    inputs = [xyz_t, new_xyz.astype(jnp.float32), split, tri]
    in_specs = [
        pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    src_c = 0
    if has_src:
        if prelifted:
            src_c = src.shape[-1]  # already feats @ W0f = C_mid channels
        elif use_xyz:
            src_c = weights_and_biases[1].shape[0]
        else:
            src_c = weights_and_biases[0].shape[0]
        srcp = src if src.dtype == jnp.bfloat16 else bf16_pack_traced(
            src.astype(jnp.float32)
        )
        inputs.append(srcp)
        cp = srcp.shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, n, cp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ))
    for wab in weights_and_biases:
        arr = wab.astype(cdtype) if wab.ndim == 2 else wab.astype(jnp.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            arr.shape, (lambda i, j: (0, 0)), memory_space=pltpu.VMEM
        ))

    kernel = functools.partial(
        _safused_kernel, radius=radius, nsample=nsample, feats=feats,
        has_src=has_src, use_xyz=use_xyz, src_c=src_c, cdtype=cdtype,
        prelifted=prelifted, stacked=stacked,
    )
    out_specs = [
        pl.BlockSpec(
            (1, tile, feats[-1]), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, m, feats[-1]), cdtype)]
    if nsample <= 64:  # K>64 emits no idx (traced-base lane stores illegal)
        out_specs.append(pl.BlockSpec(
            (1, tile, nsample), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ))
        out_shape.append(jax.ShapeDtypeStruct((b, m, nsample), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, m // tile),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    return (outs[0], outs[1]) if nsample <= 64 else (outs[0], None)


def sa_ball_mlp_pool(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    src_feats: jnp.ndarray | None,
    weights: list,
    biases: list,
    use_xyz: bool = True,
    xyz_first: bool = True,
    dtype=jnp.float32,
    interpret: bool = False,
    need_idx: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ball-select + gather + folded-BN MLP + max-pool.

    xyz: [B, N, 3] cloud; new_xyz: [B, M, 3] query centroids (from FPS);
    src_feats: [B, N, C] point features or None; weights/biases: folded
    per-layer Dense params (samlp_kernel.fold_bn_mlp_params).  Layer-0 row
    order follows the module's concat convention: ``xyz_first=True`` is the
    SSG order [xyz(3), feats(C)] (pointnet_util.py:44-47), False the MSG
    order [feats(C), xyz(3)] (pointnet_util.py:176-177).  Returns
    (pooled [B, M, feats[-1]] in ``dtype``, idx [B, M, nsample] int32) —
    bit-parity with the two-kernel chain query_ball_group_pallas +
    sa_mlp_pool (tested).  K <= 64 runs fully-unrolled slots; larger K
    (a multiple of 16, e.g. MSG's 128) runs a fori_loop over 16-slot
    unrolled chunks and returns ``idx=None`` (the traced chunk base rules
    out the lane-offset idx store — callers that need idx keep K <= 64).

    When the feature width exceeds the first layer (C > feats[0]) and
    use_xyz, the Dense-0 feature half is LIFTED per-point outside the
    kernel (the LiftedGroupMLP identity: gather(feats @ W0f) ==
    gather(feats) @ W0f), so the in-kernel one-hot gather moves feats[0]
    channels instead of C — 5x narrower at MSG SA2 scale widths (C=323 vs
    C_mid=64; the un-lifted fused form measured SLOWER than the chain in
    f32 there: 15.6 vs 14.7 ms full MSG eval).

    ``need_idx=False`` (the model eval paths, which discard idx) opts the
    no-src use_xyz shape into the spatially-BUCKETED kernel
    (sabucket_kernel.py): slot extraction contracts over a sorted window
    of candidates instead of all N — bit-exact pooled output with a
    runtime full-kernel fallback on window overflow, returning
    (pooled, None)."""
    assert nsample <= 64 or nsample % 16 == 0, (
        "fused SA layer needs K <= 64 (unrolled) or K % 16 == 0 (chunked)"
    )
    # Stacked slot extraction (one [kc*T, N] one-hot matmul per chunk via a
    # broadcast compare) vs per-slot [T, N] matmuls.  Opt-in until the
    # on-chip A/B lands; bit-parity between the two paths is tested.
    stacked = os.environ.get("SCANOBJECTNN_SA_STACKED", "0") == "1"
    has_src = src_feats is not None
    feats = tuple(int(w.shape[1]) for w in weights)
    cdtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    prelifted = bool(
        has_src and use_xyz and src_feats.shape[-1] > feats[0]
    )

    wab = []
    w0 = weights[0]
    src = None
    if use_xyz and has_src:
        w0x = w0[:3] if xyz_first else w0[-3:]
        w0f = w0[3:] if xyz_first else w0[:-3]
        if prelifted:
            wab.append(w0x)  # the kernel's only layer-0 weight
            src = jnp.dot(
                src_feats.astype(cdtype), w0f.astype(cdtype),
                preferred_element_type=jnp.float32,
            ).astype(cdtype)
        else:
            wab.append(w0x)
            wab.append(w0f)
            src = src_feats.astype(cdtype)
    else:
        wab.append(w0)
        if has_src:
            src = src_feats.astype(cdtype)
    wab.append(biases[0])
    for w_, b_ in zip(weights[1:], biases[1:]):
        wab.append(w_)
        wab.append(b_)
    wab = tuple(a.astype(cdtype) if a.ndim == 2 else a for a in wab)

    from scanobjectnn_tpu.ops.pallas.sabucket_kernel import (
        bucket_config,
        bucket_eligible,
        resolve_bucket_config,
        sa_ball_mlp_pool_bucketed,
    )

    bucket = resolve_bucket_config(
        bucket_config(), xyz.shape[1], new_xyz.shape[1]
    )
    if bucket_eligible(
        bucket, xyz.shape[1], new_xyz.shape[1], nsample, has_src, use_xyz,
        need_idx,
    ):
        if has_src:
            if prelifted:
                src_c = src.shape[-1]
            else:
                src_c = wab[1].shape[0]  # w0f rows (use_xyz layout)
        else:
            src_c = 0
        pooled = sa_ball_mlp_pool_bucketed(
            radius, nsample, xyz, new_xyz, src, wab, feats, *bucket,
            prelifted, src_c, interpret,
        )
        return pooled, None

    return _sa_ball_mlp_call(
        radius, nsample, xyz, new_xyz, src, wab, feats, use_xyz, prelifted,
        stacked, interpret
    )
