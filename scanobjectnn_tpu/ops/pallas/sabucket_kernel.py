"""Spatially-bucketed fully-fused SA layer: windowed ball select + MLP + pool.

The fused SA kernel (safused_kernel.py) is extraction-MXU-bound: its K
one-hot slot matmuls contract over ALL N candidate points per query tile,
and the round-4 N-curve probe (scripts/probe_fps_safused.py --nscale)
measured the whole program ~linear in that contraction width (~3 us/point,
SA1 B=128: 7.73 ms at N=2048 vs 4.67 at N=1024).  This kernel shrinks the
contraction width: points are sorted along each cloud's widest axis, each
tile of sorted FPS queries reads only a contiguous window of W sorted
candidates (every ball hit satisfies |key_p - key_q| < r, so a window
covering the tile's key range +- r contains every hit), and the slot
extraction/rank/d2 all run at width W instead of N.

Exactness (reference semantics: first-K-hits-in-ORIGINAL-order,
/root/reference/pointnet2/tf_ops/grouping/tf_grouping_g.cu:3-36, grouped
through the SA MLP + max-pool of pointnet_util.py:87-154) is preserved
unconditionally by three mechanisms:

  1. Window overflow (a tile whose +-r key range spans more than W sorted
     points) is detected OUTSIDE the kernel from the sorted keys alone and
     `lax.cond`s the whole batch to the proven full-width kernel.
  2. Within a window, ranking hits in sorted order selects a DIFFERENT
     first-K subset than original order only when a row has more than K
     hits.  The kernel computes exact per-row counts (the window covers
     all hits) and, under `pl.when(any cnt > K)`, re-ranks the tile by
     ORIGINAL index — a dense [T,W]@[W,W] bf16 matmul against the
     comparison matrix built from the original indices carried in the
     packed split (cols 9+10).  When every row has cnt <= K the cheap
     sorted-order rank selects exactly the all-hits set, and the max-pool
     is order-invariant, so the pooled output is bit-identical either way.
  3. Rows with zero hits pad with ORIGINAL point 0 (passed in separately —
     the window's first point is some other point after sorting).

The pooled output is therefore bit-exact vs the full kernel on every
input (parity-tested).  What this path does NOT emit is the [B, M, K]
neighbor-index array: slots are sorted-order-ranked on the fast path, so
per-row index order differs from the reference scan order even when the
set matches.  Callers that need idx (the SA-module public contract) keep
the full kernel; the model eval paths discard idx and opt in via
``need_idx=False`` (nn/pointnet_modules._fused_ball_scale).

History: round 4 built the windowed kernel (5.38 vs 7.67 ms at SA1 bench
shapes) but its XLA prep chain (3 argsorts + row gathers) cost ~7.8 ms —
a net loss, shipped default-off.  Round 5 replaced the prep with the
rank-sort kernel (ranksort_kernel.py: N^2 VPU key-compare rank + one-hot
MXU reorder, 0.81 ms at N=2048) and the output un-permute with a one-hot
MXU gather (0.18 ms), making the bucketed path a measured win
(SA1 5.81 vs 7.67 ms; headline fwd 11.97 -> 10.18 ms, both dispatch-free
two-point timings) — now DEFAULT ON via the "auto" per-shape table at the
shapes where the A/B won.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scanobjectnn_tpu.ops.pallas.ballquery_kernel import _rank_inclusive

__all__ = ["bucket_config", "bucket_eligible", "sa_ball_mlp_pool_bucketed"]


# Per-shape (N, M) -> (window W, query tile T, block granularity G) for
# sa_bucket="auto".  Window sizes come from the measured window-requirement
# distribution of FPS query tiles (max observed 1141 over gaussian clouds,
# 1111 over thin slabs at N=2048); a cloud needing more falls back to the
# full kernel at runtime, exactly.  Populated only for shapes where the
# round-5 on-chip A/B (scripts/probe_sabucket.py) measured the bucketed
# program FASTER end-to-end — the round-4 XLA argsort prep that made it
# a net loss was replaced by the rank-sort kernel (ranksort_kernel.py).
_AUTO_BUCKET = {
    # round-5 on-chip sweep (probe_sabucket): full 7.67 ms; W=1152/T=128
    # 6.29; W=896/T=64 5.81 (winner); headline fwd 11.97 -> 10.17 ms.
    (2048, 512): (896, 64, 128),
}


def bucket_config() -> tuple[int, int, int] | str | None:
    """(W, T, G), the string "auto" (per-shape table), or None (disabled).

    Configured via kernelconfig sa_bucket (TrainerConfig/CLI; the
    SCANOBJECTNN_SA_BUCKET env var overrides: "0"/"off" disables, "auto"
    or "W,T,G" enables)."""
    from scanobjectnn_tpu import kernelconfig

    return kernelconfig.sa_bucket()


def bucket_eligible(
    cfg, n: int, m: int, nsample: int, has_src: bool, use_xyz: bool,
    need_idx: bool,
) -> bool:
    """Static eligibility for the bucketed path (use_xyz SA shapes, with
    or without point features, with enough points for a real window
    reduction).  ``n >= W + G`` keeps the default real-data N=1024 eval
    configs on the full kernel (no window win exists there)."""
    cfg = resolve_bucket_config(cfg, n, m)
    if cfg is None or not use_xyz or need_idx:
        return False
    w, t, g = cfg
    return (
        nsample <= 64
        and w % 128 == 0
        and w % g == 0
        and n % g == 0
        and n >= w + g
        and m % t == 0
    )


def resolve_bucket_config(cfg, n: int, m: int):
    """Resolve "auto" to the measured per-shape table ((n, m) keyed);
    explicit tuples and None pass through."""
    if cfg == "auto":
        return _AUTO_BUCKET.get((n, m))
    return cfg


def _split_with_ids(xyz_f: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Packed [B, N, 16] bf16 split (layout of ballquery._split_and_tri:
    x0 y0 z0 x1 y1 z1 x2 y2 z2 c0 c1 + 5 zero lanes) with EXPLICIT per-row
    ids in the index columns — here the ORIGINAL point index of each
    sorted row, so in-kernel extractions return reference indices and the
    dense re-rank can compare original positions.  Must round via
    lax.reduce_precision (see _split_and_tri's excess-precision note)."""
    b, n, _ = xyz_f.shape
    h0 = lax.reduce_precision(xyz_f, 8, 7)
    r1 = xyz_f - h0
    h1 = lax.reduce_precision(r1, 8, 7)
    t2 = (r1 - h1).astype(jnp.bfloat16)
    colf = ids.astype(jnp.float32)[..., None]  # [B, N, 1], ints < 2^11
    c0 = lax.reduce_precision(colf, 8, 7)
    c1 = colf - c0  # 2-term split exact for integers <= 2^11
    return jnp.concatenate(
        [
            h0.astype(jnp.bfloat16),
            h1.astype(jnp.bfloat16),
            t2,
            c0.astype(jnp.bfloat16),
            c1.astype(jnp.bfloat16),
            jnp.zeros((b, n, 5), jnp.bfloat16),
        ],
        axis=-1,
    )


def _sabucket_kernel(
    c0_ref, *refs, radius, nsample, feats, nblocks, src_c, src_terms,
    prelifted,
):
    """One (batch, query-tile) step: concat the window blocks, select,
    extract, MLP, pool.  Mirrors _safused_kernel's no-src tail (same
    slot-extraction/padding/chunked-MLP formulation) at width W.

    With ``src_c`` (the has_src SA2 shape): the sorted feature window rides
    IN the extraction payload — each stacked slot matmul [kc*T, W] @
    [W, 16 + terms*src_c] returns centered coords AND gathered features in
    one pass, so the window bound gates the feature gather's one-hot width
    too (the full kernel's feature one-hots contract over all N)."""
    del c0_ref  # consumed by the BlockSpec index maps
    has_src = src_c > 0
    pos = 0
    xb = refs[pos : pos + nblocks]; pos += nblocks
    nq_ref = refs[pos]; pos += 1
    sb = refs[pos : pos + nblocks]; pos += nblocks
    fb = ()
    if has_src:
        fb = refs[pos : pos + nblocks]; pos += nblocks
    tri_ref = refs[pos]; pos += 1
    p0_ref = refs[pos]; pos += 1
    p0f_ref = None
    if has_src:
        p0f_ref = refs[pos]; pos += 1
    w0_ref = refs[pos]; pos += 1  # w0x when has_src (use_xyz layout)
    w0f_ref = None
    if has_src and not prelifted:
        w0f_ref = refs[pos]; pos += 1
    b0_ref = refs[pos]; pos += 1
    wb = refs[pos : pos + 2 * (len(feats) - 1)]
    out_ref = refs[-2]
    rank_ref = refs[-1]  # [T, W] f32 scratch

    xw = jnp.concatenate([r[0] for r in xb], axis=1)  # [3, W]
    x, y, z = xw[0:1, :], xw[1:2, :], xw[2:3, :]
    split = jnp.concatenate([r[0] for r in sb], axis=0)  # [W, 16]
    q = nq_ref[0]  # [T, 3] sorted queries
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    tile = q.shape[0]

    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # [T, W]
    hit = d2 < radius * radius
    cnt_total = jnp.sum(hit.astype(jnp.int32), axis=1)  # [T] exact: the
    # window covers every hit (the caller's overflow gate guarantees it)

    # Cheap sorted-order rank.  When every row has cnt <= K the selected
    # set is ALL hits regardless of rank order, and the max-pool is
    # order-invariant — bit-exact.  Otherwise the kept subset must be the
    # first K in ORIGINAL order: re-rank by the original index.
    rank_ref[...] = _rank_inclusive(hit, tri_ref[...])
    dense = jnp.max(cnt_total) > nsample

    @pl.when(dense)
    def _orig_order_rank():
        of = (
            split[:, 9:10].astype(jnp.float32)
            + split[:, 10:11].astype(jnp.float32)
        )  # [W, 1] original indices, exact ints
        cmp = jnp.where(of <= jnp.transpose(of), 1.0, 0.0).astype(
            jnp.bfloat16
        )  # C[l', l] = [orig(l') <= orig(l)]
        hitb = jnp.where(hit, 1.0, 0.0).astype(jnp.bfloat16)
        rank_ref[...] = lax.dot_general(
            hitb, cmp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # exact integer counts (0/1 products, f32 accumulation)

    slot = jnp.where(hit, rank_ref[...], jnp.float32(0.0))
    cdtype = w0_ref.dtype
    cnt2 = cnt_total[:, None]
    has = (cnt_total > 0)[:, None]
    p0 = p0_ref[0]  # [1, 3]
    kc = 1
    for cand in range(1, nsample + 1):
        if nsample % cand == 0 and cand * tile <= 2048:
            kc = cand

    if has_src:
        # ---- combined coord+feature extraction (stacked slots) ----
        srcw = jnp.concatenate([r[0] for r in fb], axis=0)  # [W, terms*C]
        payload = jnp.concatenate([split, srcw], axis=1)  # [W, 16+CP]

        def sum_terms(e):  # packed feature cols -> [rows, src_c] f32
            g = e[:, 16 : 16 + src_c]
            for u in range(1, src_terms):
                g = g + e[:, 16 + u * src_c : 16 + (u + 1) * src_c]
            return g

        def slot_ext1(kf):  # single-slot [T, 16+CP] (padding terms)
            selb = jnp.where(slot == kf, 1.0, 0.0).astype(jnp.bfloat16)
            return lax.dot_general(
                selb, payload, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # Padding: repeat the first hit (coords AND features); zero-hit
        # rows take ORIGINAL point 0 and ITS features (the reference
        # pre-fills idx=0, so group_point gathers point 0's features —
        # tf_grouping_g.cu:26-29).
        e0 = slot_ext1(jnp.float32(1.0))
        fx = jnp.where(has, e0[:, 0:1] + e0[:, 3:4] + e0[:, 6:7], p0[0, 0])
        fy = jnp.where(has, e0[:, 1:2] + e0[:, 4:5] + e0[:, 7:8], p0[0, 1])
        fz = jnp.where(has, e0[:, 2:3] + e0[:, 5:6] + e0[:, 8:9], p0[0, 2])
        ffeat = jnp.where(has, sum_terms(e0), p0f_ref[0])  # [T, src_c]

        def bcast(t, c):  # [T, c] -> [kc*T, c], leading-dim merge
            return jnp.broadcast_to(t[None], (kc, tile, c)).reshape(
                kc * tile, c
            )

        acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
        for chunk in range(nsample // kc):
            kf = (
                float(chunk * kc) + 1.0
                + lax.broadcasted_iota(jnp.int32, (kc, 1, 1), 0).astype(
                    jnp.float32
                )
            )
            ohs = jnp.where(slot[None, :, :] == kf, 1.0, 0.0).astype(
                jnp.bfloat16
            )
            e = lax.dot_general(
                ohs.reshape(kc * tile, slot.shape[1]), payload,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [kc*T, 16+CP]
            v = jnp.broadcast_to(kf - 1.0, (kc, tile, 1)).reshape(
                kc * tile, 1
            ) < bcast(cnt2.astype(jnp.float32), 1)
            gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], bcast(fx, 1)) - bcast(qx, 1)
            gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], bcast(fy, 1)) - bcast(qy, 1)
            gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], bcast(fz, 1)) - bcast(qz, 1)
            c3 = jnp.concatenate([gx, gy, gz], axis=1)
            g = jnp.where(v, sum_terms(e), bcast(ffeat, src_c))
            if prelifted:
                h = g  # srcw already carries feats @ W0f
            else:
                h = jnp.dot(
                    g.astype(cdtype), w0f_ref[...],
                    preferred_element_type=jnp.float32,
                )
            h = h + jnp.dot(
                c3.astype(cdtype), w0_ref[...],
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(h + b0_ref[0], 0.0)
            for i in range(len(feats) - 1):
                h = jnp.dot(
                    h.astype(cdtype), wb[2 * i][...],
                    preferred_element_type=jnp.float32,
                )
                h = jnp.maximum(h + wb[2 * i + 1][0], 0.0)
            acc = jnp.maximum(
                acc, jnp.max(h.reshape(kc, tile, feats[-1]), axis=0)
            )
        out_ref[0] = acc.astype(out_ref.dtype)
        return

    def slot_ext(kf):
        selb = jnp.where(slot == kf, 1.0, 0.0).astype(jnp.bfloat16)
        return lax.dot_general(
            selb, split, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 16]

    # Padding: repeat the first (by active rank order) hit; zero-hit rows
    # take ORIGINAL point 0, centered (tf_grouping_g.cu pre-fill).
    e0 = slot_ext(jnp.float32(1.0))
    fx = jnp.where(has, e0[:, 0:1] + e0[:, 3:4] + e0[:, 6:7], p0[0, 0])
    fy = jnp.where(has, e0[:, 1:2] + e0[:, 4:5] + e0[:, 7:8], p0[0, 1])
    fz = jnp.where(has, e0[:, 2:3] + e0[:, 5:6] + e0[:, 8:9], p0[0, 2])

    def slot_vals(k):
        e = slot_ext(jnp.float32(k + 1))
        v = k < cnt2
        gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], fx) - qx
        gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], fy) - qy
        gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], fz) - qz
        return jnp.concatenate([gx, gy, gz], axis=1)

    def mlp_chunk(coords_k):
        kcn = len(coords_k)
        c3 = jnp.stack(coords_k, axis=0).reshape(kcn * tile, 3)
        h = jnp.dot(
            c3.astype(cdtype), w0_ref[...], preferred_element_type=jnp.float32
        )
        h = jnp.maximum(h + b0_ref[0], 0.0)
        for i in range(len(feats) - 1):
            h = jnp.dot(
                h.astype(cdtype), wb[2 * i][...],
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(h + wb[2 * i + 1][0], 0.0)
        return jnp.max(h.reshape(kcn, tile, feats[-1]), axis=0)

    vals = [slot_vals(k) for k in range(nsample)]
    acc = jnp.full((tile, feats[-1]), -jnp.inf, jnp.float32)
    for chunk in range(nsample // kc):
        acc = jnp.maximum(
            acc, mlp_chunk(vals[chunk * kc : (chunk + 1) * kc])
        )
    out_ref[0] = acc.astype(out_ref.dtype)


def _imap_lane(u):
    """Index map for the u-th window block of the [B, 3, N] coord planes."""
    return lambda i, j, c0, u=u: (i, 0, c0[i, j] + u)


def _imap_sub(u):
    """Index map for the u-th window block of the [B, N, 16] split."""
    return lambda i, j, c0, u=u: (i, c0[i, j] + u, 0)


def _bucketed_pallas(
    radius, nsample, feats, window, qtile, gblk, interpret,
    c0, xyz_t, nq_s, split_s, tri, p0, weights_and_biases, cdtype,
    srcp_s=None, p0f=None, prelifted=False, src_c=0,
):
    """The windowed pallas_call itself, on pre-sorted operands (factored
    out so probes can time it separately from the sort/gather prep)."""
    b = xyz_t.shape[0]
    m = nq_s.shape[1]
    nblocks = window // gblk
    inputs, in_specs = [], []
    for u in range(nblocks):
        inputs.append(xyz_t)
        in_specs.append(pl.BlockSpec(
            (1, 3, gblk), _imap_lane(u), memory_space=pltpu.VMEM
        ))
    inputs.append(nq_s)
    in_specs.append(pl.BlockSpec(
        (1, qtile, 3), lambda i, j, c0: (i, j, 0), memory_space=pltpu.VMEM
    ))
    for u in range(nblocks):
        inputs.append(split_s)
        in_specs.append(pl.BlockSpec(
            (1, gblk, 16), _imap_sub(u), memory_space=pltpu.VMEM
        ))
    src_terms = 0
    if srcp_s is not None:
        cp = srcp_s.shape[-1]
        src_terms = cp // src_c
        for u in range(nblocks):
            inputs.append(srcp_s)
            in_specs.append(pl.BlockSpec(
                (1, gblk, cp), _imap_sub(u), memory_space=pltpu.VMEM
            ))
    inputs.append(tri)
    in_specs.append(pl.BlockSpec(
        (128, 128), lambda i, j, c0: (0, 0), memory_space=pltpu.VMEM
    ))
    inputs.append(p0)
    in_specs.append(pl.BlockSpec(
        (1, 1, 3), lambda i, j, c0: (i, 0, 0), memory_space=pltpu.VMEM
    ))
    if srcp_s is not None:
        inputs.append(p0f)
        in_specs.append(pl.BlockSpec(
            (1, 1, src_c), lambda i, j, c0: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    for wab in weights_and_biases:
        arr = (
            wab.astype(cdtype) if wab.ndim == 2 else wab.astype(jnp.float32)
        )
        if arr.ndim == 1:
            arr = arr[None, :]
        inputs.append(arr)
        in_specs.append(pl.BlockSpec(
            arr.shape, (lambda i, j, c0: (0, 0)), memory_space=pltpu.VMEM
        ))
    kernel = functools.partial(
        _sabucket_kernel, radius=radius, nsample=nsample, feats=feats,
        nblocks=nblocks, src_c=src_c if srcp_s is not None else 0,
        src_terms=src_terms, prelifted=prelifted,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, m // qtile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, qtile, feats[-1]), lambda i, j, c0: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((qtile, window), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, feats[-1]), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(c0, *inputs)


@functools.partial(jax.jit, static_argnums=(0, 1, 6, 7, 8, 9, 10, 11, 12))
def sa_ball_mlp_pool_bucketed(
    radius,
    nsample,
    xyz,
    new_xyz,
    src,
    weights_and_biases,
    feats: tuple,
    window: int,
    qtile: int,
    gblk: int,
    prelifted: bool,
    src_c: int,
    interpret: bool,
):
    """Bucketed fused SA layer for the use_xyz shapes (with or without
    point features).

    ``src`` is the feature array in _sa_ball_mlp_call's convention (bf16
    1-term, or any float packed to 3 bf16 terms here); ``src_c`` its
    logical channel count; ``weights_and_biases`` the folded list in
    safused's layout ([w0x, w0f?, b0, w1, b1, ...] when src is given).

    Returns the pooled [B, M, feats[-1]] array only (no idx — see module
    docstring); bit-exact vs safused_kernel.sa_ball_mlp_pool's pooled
    output on every input (window overflow falls back to it wholesale)."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz_f = xyz.astype(jnp.float32)
    nq_f = new_xyz.astype(jnp.float32)
    srcp = None
    if src is not None:
        from scanobjectnn_tpu.ops.pallas.onehot import bf16_pack_traced

        srcp = src if src.dtype == jnp.bfloat16 else bf16_pack_traced(
            src.astype(jnp.float32)
        )

    # Sort key: the coordinate along each cloud's WIDEST axis (thin
    # objects then still spread their mass across the sorted range).
    ext = jnp.max(xyz_f, axis=1) - jnp.min(xyz_f, axis=1)  # [B, 3]
    axsel = jax.nn.one_hot(jnp.argmax(ext, axis=-1), 3, dtype=jnp.float32)
    key = jnp.sum(xyz_f * axsel[:, None, :], axis=-1)  # [B, N]
    qkey = jnp.sum(nq_f * axsel[:, None, :], axis=-1)  # [B, M]

    # Physical reorder via the rank-sort kernel (ranksort_kernel.py): the
    # round-4 XLA prep (3 argsorts + row gathers + split build) measured
    # ~7.8 ms at SA1 bench shapes — more than the windowed kernel saves.
    # rank_sort_points emits the sorted coordinate planes, the packed
    # split (original ids in cols 9/10 — byte-identical to
    # _split_with_ids(sorted_xyz, order)), and for the queries the rank
    # itself, which IS the inverse permutation the output un-permute
    # needs (rank == argsort(argsort(key)); all parity-tested).
    from scanobjectnn_tpu.ops.pallas.ranksort_kernel import rank_sort_points

    planes_s, split_s, srcp_s, _ = rank_sort_points(
        key, jnp.transpose(xyz_f, (0, 2, 1)),
        None if srcp is None else jnp.transpose(srcp, (0, 2, 1)),
        True, False, interpret,
    )
    xyz_t = planes_s[:, :3, :]  # [B, 3, N] sorted, lane-major
    key_s = jnp.sum(xyz_t * axsel[:, :, None], axis=1)  # [B, N]
    q_planes_s, _, _, inv_q = rank_sort_points(
        qkey, jnp.transpose(nq_f, (0, 2, 1)), None, False, True, interpret
    )
    nq_s = jnp.transpose(q_planes_s[:, :3, :], (0, 2, 1))  # [B, M, 3]
    qkey_s = jnp.sum(q_planes_s[:, :3, :] * axsel[:, :, None], axis=1)

    # Per-tile window start (G-block units) + the overflow gate.  pad_r
    # absorbs f32 rounding between the kernel's elementwise d2 and the
    # |key_p - key_q| < r slab bound (a few ulp; margin is ~1e-5 r).
    mt = m // qtile
    pad_r = radius * (1.0 + 1e-5) + 1e-6
    qk = qkey_s.reshape(b, mt, qtile)
    lo = qk[:, :, 0] - pad_r
    hi = qk[:, :, -1] + pad_r
    start = jnp.sum(
        (key_s[:, None, :] < lo[:, :, None]).astype(jnp.int32), axis=-1
    )
    end = jnp.sum(
        (key_s[:, None, :] <= hi[:, :, None]).astype(jnp.int32), axis=-1
    )
    c0 = jnp.clip(start // gblk, 0, n // gblk - window // gblk).astype(
        jnp.int32
    )
    ov = jnp.any(end > c0 * gblk + window)

    tri = (
        jnp.arange(128, dtype=jnp.int32)[:, None]
        <= jnp.arange(128, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    p0 = xyz_f[:, 0:1, :]  # original point 0 (zero-hit padding)
    p0f = None
    if srcp is not None:
        # Point 0's features, term-summed to f32 (the zero-hit fallback —
        # the reference pre-fills idx=0, tf_grouping_g.cu:26-29).
        p0row = srcp[:, 0:1, :].astype(jnp.float32)  # [B, 1, terms*C]
        p0f = p0row[..., :src_c]
        for u in range(1, p0row.shape[-1] // src_c):
            p0f = p0f + p0row[..., u * src_c : (u + 1) * src_c]
    cdtype = weights_and_biases[0].dtype

    def run_bucketed(_):
        pooled_s = _bucketed_pallas(
            radius, nsample, feats, window, qtile, gblk, interpret,
            c0, xyz_t, nq_s, split_s, tri, p0, weights_and_biases, cdtype,
            srcp_s=srcp_s, p0f=p0f, prelifted=prelifted, src_c=src_c,
        )
        # Un-permute to FPS query order: a one-hot MXU gather (bit-exact —
        # 1-term for bf16 pooled values, 3-term split for f32), not an XLA
        # row gather (docs/KERNELS.md "Row-copy gather kernel").
        from scanobjectnn_tpu.ops.pallas.onehot import flat_gather

        exact = cdtype != jnp.bfloat16
        return flat_gather(pooled_s, inv_q, exact).astype(cdtype)

    def run_full(_):
        from scanobjectnn_tpu.ops.pallas.safused_kernel import (
            _sa_ball_mlp_call,
        )

        # Pass the UNPACKED src: _sa_ball_mlp_call packs it itself (and
        # derives src_c from src.shape in the prelifted case, which would
        # misread a pre-packed multi-term array).
        return _sa_ball_mlp_call(
            radius, nsample, xyz, new_xyz, src, weights_and_biases, feats,
            True, prelifted, False, interpret,
        )[0]

    return lax.cond(ov, run_full, run_bucketed, None)
