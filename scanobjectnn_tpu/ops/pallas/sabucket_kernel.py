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


def bucket_config() -> tuple[int, int, int] | None:
    """(window W, query tile T, block granularity G) or None (disabled).

    ``SCANOBJECTNN_SA_BUCKET``: unset/"0" disables, "W,T,G" enables.  The
    candidate config (1152, 128, 128) was sized from the window-requirement
    distribution of FPS query tiles on the headline N=2048 shapes
    (max observed 1141 over gaussian clouds, 1111 over thin-slab clouds);
    larger windows fall back to the full kernel at runtime, exactly.

    DEFAULT OFF: the first on-chip A/B (round 4) measured the bucketed
    program SLOWER end-to-end than the full kernel (13.1-13.9 vs 7.67 ms
    at SA1 bench shapes) despite the halved extraction width — the
    decomposition probes (scripts/probe_sabucket.py) attribute it to the
    XLA prep chain (argsorts) and per-step windowed-DMA overhead; stays
    opt-in until a variant wins."""
    env = os.environ.get("SCANOBJECTNN_SA_BUCKET", "")
    if env in ("", "0", "off"):
        return None
    w, t, g = (int(v) for v in env.split(","))
    return w, t, g


def bucket_eligible(
    cfg, n: int, m: int, nsample: int, has_src: bool, use_xyz: bool,
    need_idx: bool,
) -> bool:
    """Static eligibility for the bucketed path (the no-src use_xyz SA
    shape — SSG/BGA/MSG layer 1 — with enough points for a real window
    reduction).  ``n >= W + G`` keeps the default real-data N=1024 eval
    configs on the full kernel (no window win exists there)."""
    if cfg is None or has_src or not use_xyz or need_idx:
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
    c0_ref, *refs, radius, nsample, feats, nblocks,
):
    """One (batch, query-tile) step: concat the window blocks, select,
    extract, MLP, pool.  Mirrors _safused_kernel's no-src tail (same
    slot-extraction/padding/chunked-MLP formulation) at width W."""
    del c0_ref  # consumed by the BlockSpec index maps
    xb = refs[:nblocks]
    nq_ref = refs[nblocks]
    sb = refs[nblocks + 1 : 2 * nblocks + 1]
    tri_ref = refs[2 * nblocks + 1]
    p0_ref = refs[2 * nblocks + 2]
    w0_ref = refs[2 * nblocks + 3]
    b0_ref = refs[2 * nblocks + 4]
    wb = refs[2 * nblocks + 5 : 2 * nblocks + 5 + 2 * (len(feats) - 1)]
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

    def slot_ext(kf):
        selb = jnp.where(slot == kf, 1.0, 0.0).astype(jnp.bfloat16)
        return lax.dot_general(
            selb, split, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 16]

    # Padding: repeat the first (by active rank order) hit; zero-hit rows
    # take ORIGINAL point 0, centered (tf_grouping_g.cu pre-fill).
    has = (cnt_total > 0)[:, None]
    e0 = slot_ext(jnp.float32(1.0))
    p0 = p0_ref[0]  # [1, 3]
    fx = jnp.where(has, e0[:, 0:1] + e0[:, 3:4] + e0[:, 6:7], p0[0, 0])
    fy = jnp.where(has, e0[:, 1:2] + e0[:, 4:5] + e0[:, 7:8], p0[0, 1])
    fz = jnp.where(has, e0[:, 2:3] + e0[:, 5:6] + e0[:, 8:9], p0[0, 2])
    cnt2 = cnt_total[:, None]

    def slot_vals(k):
        e = slot_ext(jnp.float32(k + 1))
        v = k < cnt2
        gx = jnp.where(v, e[:, 0:1] + e[:, 3:4] + e[:, 6:7], fx) - qx
        gy = jnp.where(v, e[:, 1:2] + e[:, 4:5] + e[:, 7:8], fy) - qy
        gz = jnp.where(v, e[:, 2:3] + e[:, 5:6] + e[:, 8:9], fz) - qz
        return jnp.concatenate([gx, gy, gz], axis=1)

    cdtype = w0_ref.dtype

    def mlp_chunk(coords_k):
        kc = len(coords_k)
        c3 = jnp.stack(coords_k, axis=0).reshape(kc * tile, 3)
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
        return jnp.max(h.reshape(kc, tile, feats[-1]), axis=0)

    kc = 1
    for cand in range(1, nsample + 1):
        if nsample % cand == 0 and cand * tile <= 2048:
            kc = cand
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
    inputs.append(tri)
    in_specs.append(pl.BlockSpec(
        (128, 128), lambda i, j, c0: (0, 0), memory_space=pltpu.VMEM
    ))
    inputs.append(p0)
    in_specs.append(pl.BlockSpec(
        (1, 1, 3), lambda i, j, c0: (i, 0, 0), memory_space=pltpu.VMEM
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
        nblocks=nblocks,
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


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6, 7, 8, 9))
def sa_ball_mlp_pool_bucketed(
    radius,
    nsample,
    xyz,
    new_xyz,
    weights_and_biases,
    feats: tuple,
    window: int,
    qtile: int,
    gblk: int,
    interpret: bool,
):
    """Bucketed fused SA layer for the no-src use_xyz shape.

    Returns the pooled [B, M, feats[-1]] array only (no idx — see module
    docstring); bit-exact vs safused_kernel.sa_ball_mlp_pool's pooled
    output on every input (window overflow falls back to it wholesale)."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz_f = xyz.astype(jnp.float32)
    nq_f = new_xyz.astype(jnp.float32)

    # Sort key: the coordinate along each cloud's WIDEST axis (thin
    # objects then still spread their mass across the sorted range).
    ext = jnp.max(xyz_f, axis=1) - jnp.min(xyz_f, axis=1)  # [B, 3]
    axsel = jax.nn.one_hot(jnp.argmax(ext, axis=-1), 3, dtype=jnp.float32)
    key = jnp.sum(xyz_f * axsel[:, None, :], axis=-1)  # [B, N]
    qkey = jnp.sum(nq_f * axsel[:, None, :], axis=-1)  # [B, M]

    from scanobjectnn_tpu.ops.grouping import batched_index_gather

    order = jnp.argsort(key, axis=1)
    key_s = jnp.take_along_axis(key, order, axis=1)
    xyz_s = batched_index_gather(xyz_f, order)
    split_s = _split_with_ids(xyz_s, order)
    qorder = jnp.argsort(qkey, axis=1)
    qkey_s = jnp.take_along_axis(qkey, qorder, axis=1)
    nq_s = batched_index_gather(nq_f, qorder)
    inv_q = jnp.argsort(qorder, axis=1)

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

    xyz_t = jnp.transpose(xyz_s, (0, 2, 1))  # [B, 3, N] sorted
    tri = (
        jnp.arange(128, dtype=jnp.int32)[:, None]
        <= jnp.arange(128, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    p0 = xyz_f[:, 0:1, :]  # original point 0 (zero-hit padding)
    cdtype = weights_and_biases[0].dtype

    def run_bucketed(_):
        pooled_s = _bucketed_pallas(
            radius, nsample, feats, window, qtile, gblk, interpret,
            c0, xyz_t, nq_s, split_s, tri, p0, weights_and_biases, cdtype,
        )
        return batched_index_gather(pooled_s, inv_q)

    def run_full(_):
        from scanobjectnn_tpu.ops.pallas.safused_kernel import (
            _sa_ball_mlp_call,
        )

        return _sa_ball_mlp_call(
            radius, nsample, xyz, new_xyz, None, weights_and_biases, feats,
            True, False, False, interpret,
        )[0]

    return lax.cond(ov, run_full, run_bucketed, None)
