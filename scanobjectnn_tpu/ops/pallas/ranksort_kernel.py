"""Exact rank-sort of point clouds by a scalar key — the bucketed-SA prep.

The spatially-bucketed SA kernel (sabucket_kernel.py) needs its candidates
and queries physically reordered by a spatial key so each query tile can
read a contiguous window.  Round 4 built that prep out of XLA argsorts and
row gathers and measured the chain at ~7.8 ms (B=128, N=2048) — more than
the 2.3 ms the windowed kernel saves (commit 4fe03d5).  XLA's TPU sort is
a serial-ish comparator network and its row gathers run far off the HBM
roofline (docs/KERNELS.md "Row-copy gather kernel"), so this module
replaces the whole chain with ONE Pallas program per operand built from
the repo's two proven primitives:

  * rank via brute-force key comparison on the VPU — rank(i) = #{j :
    key_j < key_i or (key_j == key_i and j < i)}, i.e. exactly the
    permutation of a STABLE argsort (parity-tested against jnp.argsort);
    N^2/8 lane-compares per cloud is ~17M VPU ops at N=2048 — far cheaper
    than a log^2 N comparator network serialized over lanes;
  * physical reorder via one-hot MXU matmuls (the onehot.py convention):
    payload channels are carried as bf16 PLANES [P, N] (coordinate 3-term
    Dekker splits + 2-term integer index splits, all exact), and each
    sorted tile is payload @ onehot(rank == tile columns) — one [P, N] x
    [N, T] matmul per output tile.

Outputs per cloud: sorted coordinate planes [3, N] f32 (reconstructed
x0+x1+x2 — bit-exact f32), the packed [N, 16] bf16 split with ORIGINAL
point indices in columns 9/10 (the sabucket kernel's expected layout,
_split_with_ids), and optionally the rank itself (for queries the rank IS
the inverse permutation the caller needs to un-permute pooled outputs).

No reference counterpart: /root/reference has no spatial bucketing at all
(its ball query scans all N candidates per query,
pointnet2/tf_ops/grouping/tf_grouping_g.cu:3-36); this is TPU-side
infrastructure for beating that scan's MXU-bound equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rank_sort_points"]


def _ranksort_kernel(
    key_ref, xyz_ref, *refs, n, rtile, otile, emit_split, emit_rank,
    feat_planes,
):
    """Grid (B,): rank every point of one cloud, then scatter payload
    planes into sorted order tile by tile."""
    pos = 0
    featp_ref = None
    if feat_planes:
        featp_ref = refs[pos]
        pos += 1
    outs = list(refs[pos:])
    planes_out = outs.pop(0)  # [1, 8, N] f32 (rows 0-2 = sorted x,y,z)
    split_out = outs.pop(0) if emit_split else None  # [1, N, 16] bf16
    featp_out = outs.pop(0) if feat_planes else None  # [1, N, C] bf16
    rank_out = outs.pop(0) if emit_rank else None  # [1, N, 1] i32
    rank_scr = outs.pop(0)  # [N, 1] f32 scratch

    key = key_ref[0]  # [1, N] f32 (block keeps a leading singleton)
    lane = lax.broadcasted_iota(jnp.int32, (rtile, n), 1)

    # ---- phase 1: exact stable rank, row tiles of `rtile` ----
    for t in range(n // rtile):
        # Row-major copies of this tile's keys/indices: [rtile, 1].
        kcol = key[0, t * rtile : (t + 1) * rtile][:, None]
        icol = (
            lax.broadcasted_iota(jnp.int32, (rtile, 1), 0) + t * rtile
        )
        lt = key < kcol
        tie = jnp.logical_and(key == kcol, lane < icol)
        r = jnp.sum(
            jnp.logical_or(lt, tie).astype(jnp.float32), axis=1,
            keepdims=True,
        )  # [rtile, 1] exact integer counts (< 2^24)
        rank_scr[t * rtile : (t + 1) * rtile, :] = r

    if emit_rank:
        rank_out[0] = rank_scr[...].astype(jnp.int32)

    # ---- phase 2: payload planes, split in-kernel (Mosaic-safe) ----
    x = xyz_ref[0, 0:1, :]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]

    def split3(v):  # [1, N] f32 -> three exact bf16 terms
        h0 = v.astype(jnp.bfloat16)
        r1 = v - h0.astype(jnp.float32)
        h1 = r1.astype(jnp.bfloat16)
        t2 = (r1 - h1.astype(jnp.float32)).astype(jnp.bfloat16)
        return h0, h1, t2

    x0, x1, x2 = split3(x)
    y0, y1, y2 = split3(y)
    z0, z1, z2 = split3(z)
    iota_f = lane[0:1, :].astype(jnp.float32)  # [1, N] original indices
    c0 = iota_f.astype(jnp.bfloat16)
    c1 = (iota_f - c0.astype(jnp.float32)).astype(jnp.bfloat16)
    zero = jnp.zeros((1, n), jnp.bfloat16)
    # Row order = the packed-split column order (ballquery._split_and_tri):
    # x0 y0 z0 x1 y1 z1 x2 y2 z2 c0 c1 + 5 zero rows.
    payload = jnp.concatenate(
        [x0, y0, z0, x1, y1, z1, x2, y2, z2, c0, c1, zero, zero, zero,
         zero, zero],
        axis=0,
    )  # [16, N] bf16

    # ---- phase 3: one-hot scatter into sorted order, `otile` columns ----
    rank_col = rank_scr[...]  # [N, 1] f32
    for t in range(n // otile):
        # int32 iota then cast: Mosaic's tpu.iota cannot emit f32 directly.
        cols = (
            lax.broadcasted_iota(jnp.int32, (n, otile), 1) + t * otile
        ).astype(jnp.float32)
        oh = jnp.where(rank_col == cols, 1.0, 0.0).astype(jnp.bfloat16)
        st = lax.dot_general(
            payload, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [16, otile] f32: sorted split terms, column-major
        xs = st[0:1] + st[3:4] + st[6:7]  # exact f32 x (3-term sum)
        ys = st[1:2] + st[4:5] + st[7:8]
        zs = st[2:3] + st[5:6] + st[8:9]
        planes_out[0, 0:3, t * otile : (t + 1) * otile] = jnp.concatenate(
            [xs, ys, zs], axis=0
        )
        if emit_split:
            split_out[0, t * otile : (t + 1) * otile, :] = jnp.transpose(
                st.astype(jnp.bfloat16), (1, 0)
            )
        if feat_planes:
            fs = lax.dot_general(
                featp_ref[0], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, otile] — featp is bf16 (1-term), one-hot exact
            # Row-major output (the bucketed kernel reads [gblk, C] window
            # blocks): one small [C, otile] transpose per tile.
            featp_out[0, t * otile : (t + 1) * otile, :] = jnp.transpose(
                fs.astype(featp_out.dtype), (1, 0)
            )

    # Rows 3-7 of the planes output are sublane padding (trailing-dim-3
    # blocks waste 42x VMEM — CLAUDE.md); zero them once.
    planes_out[0, 3:8, :] = jnp.zeros((5, n), jnp.float32)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def rank_sort_points(
    key: jnp.ndarray,
    xyz_t: jnp.ndarray,
    feat_planes: jnp.ndarray | None,
    emit_split: bool,
    emit_rank: bool,
    interpret: bool,
):
    """Stable-sort each cloud by ``key``; return physically-sorted payloads.

    key [B, N] f32; xyz_t [B, 3, N] f32 (lane-major coordinate planes);
    feat_planes [B, C, N] bf16 or None (pre-packed feature terms to carry
    through the same permutation — the SA2 bucketing path).

    Returns (planes_s, split_s, featp_s, rank):
      planes_s [B, 8, N] f32 — rows 0-2 are the sorted x/y/z planes
        (bit-exact f32; rows 3-7 zero sublane padding);
      split_s  [B, N, 16] bf16 (emit_split) — the packed split of the
        sorted cloud with ORIGINAL indices in columns 9/10, byte-identical
        to sabucket._split_with_ids(sorted_xyz, order);
      featp_s  [B, N, C] bf16 (feat_planes given) — feature ROWS sorted
        by the same permutation (row-major: the bucketed kernel reads
        [gblk, C] window blocks);
      rank     [B, N] int32 (emit_rank) — the sorted position of each
        ORIGINAL row, i.e. the inverse of the sort permutation (equal to
        jnp.argsort(jnp.argsort(key, stable=True)); parity-tested).
    """
    b, n = key.shape
    rtile = 256 if n % 256 == 0 else 128
    otile = 256 if n % 256 == 0 else 128
    assert n % rtile == 0 and n % otile == 0, (n, rtile, otile)

    inputs = [key[:, None, :], xyz_t]
    in_specs = [
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    nf = 0
    if feat_planes is not None:
        nf = feat_planes.shape[1]
        inputs.append(feat_planes)
        in_specs.append(pl.BlockSpec(
            (1, nf, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))

    out_specs = [pl.BlockSpec(
        (1, 8, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )]
    out_shape = [jax.ShapeDtypeStruct((b, 8, n), jnp.float32)]
    if emit_split:
        out_specs.append(pl.BlockSpec(
            (1, n, 16), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
        out_shape.append(jax.ShapeDtypeStruct((b, n, 16), jnp.bfloat16))
    if feat_planes is not None:
        out_specs.append(pl.BlockSpec(
            (1, n, nf), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
        out_shape.append(jax.ShapeDtypeStruct((b, n, nf), jnp.bfloat16))
    if emit_rank:
        out_specs.append(pl.BlockSpec(
            (1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ))
        out_shape.append(jax.ShapeDtypeStruct((b, n, 1), jnp.int32))

    kernel = functools.partial(
        _ranksort_kernel, n=n, rtile=rtile, otile=otile,
        emit_split=emit_split, emit_rank=emit_rank,
        feat_planes=feat_planes is not None,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    outs = list(outs)
    planes_s = outs.pop(0)
    split_s = outs.pop(0) if emit_split else None
    featp_s = outs.pop(0) if feat_planes is not None else None
    rank = outs.pop(0)[..., 0] if emit_rank else None
    return planes_s, split_s, featp_s, rank
