"""Fused ball-query Pallas kernel.

Replaces the XLA counting formulation (ops/grouping.py) for large point
counts.  Semantics identical to the CUDA kernel (tf_grouping_g.cu:3-36):
first ``nsample`` points within ``radius`` IN ORIGINAL POINT ORDER, rows
padded by repeating the first hit, ``pts_cnt`` capped at nsample.

Why Pallas: XLA materializes the [B, M, N] cumulative-sum tensor in HBM and
re-reads it for the rank counts; here distances, hit mask, cumsum, and all K
rank counts stay resident in VMEM per (batch, query-tile) program — one HBM
read of the cloud, one write of the [T, K] indices.

Distance formulation: direct (q − p)² differences (exact at zero, like the
CUDA kernel) rather than the |a|²−2ab+|b|² expansion — self-hits are exact.

``query_ball_group_pallas`` additionally emits the CENTERED grouped
coordinates (the ``group_point(xyz, idx) − new_xyz`` the SA module needs,
pointnet_util.py:44-47) from the same min-extraction rounds — each selected
lane's coordinates drop out of three extra masked reduces per round, removing
the separate XLA gather (~4.7 ms at SA1 shapes) entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["query_ball_pallas"]


def _ball_kernel(xyz_ref, new_xyz_ref, idx_ref, cnt_ref, *, radius, nsample):
    # xyz_ref: [1, 3, N]; new_xyz_ref: [1, T, 3]; idx_ref: [1, T, nsample];
    # cnt_ref: [1, T, 1] (3-D so the (sublane, lane) tile rules hold).
    x = xyz_ref[0, 0, :][None, :]  # [1, N]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    q = new_xyz_ref[0]  # [T, 3]
    qx = q[:, 0:1]  # [T, 1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]

    n = x.shape[-1]
    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # [T, N]
    d = jnp.maximum(jnp.sqrt(d2), 1e-20)
    hit = d < radius

    cnt_total = jnp.sum(hit.astype(jnp.int32), axis=1)  # [T]
    cnt_ref[0, :, 0] = jnp.minimum(cnt_total, nsample).astype(jnp.int32)

    # First-nsample-in-order selection by K rounds of min-extraction over
    # hit-position keys (Mosaic has no cumsum primitive; keys are unique so
    # equality masking removes exactly the extracted lane).
    col = jax.lax.broadcasted_iota(jnp.int32, hit.shape, dimension=1)
    big = jnp.int32(n)
    keys = jnp.where(hit, col, big)  # [T, N]
    cols = []
    for _ in range(nsample):
        mk = jnp.min(keys, axis=1)  # [T]; == n when exhausted
        cols.append(mk)
        keys = jnp.where(keys == mk[:, None], big, keys)
    idx = jnp.stack(cols, axis=1)  # [T, nsample], ascending original order

    first_hit = jnp.where(cnt_total > 0, idx[:, 0], 0)
    idx_ref[0, :, :] = jnp.where(idx < n, idx, first_hit[:, None]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def query_ball_pallas(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ball query: ([B,N,3], [B,M,3]) -> (idx[B,M,nsample], pts_cnt[B,M])."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    # Query tile: keep [T, N] f32 tiles comfortably in VMEM.
    tile = m
    for cand in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if m % cand == 0:
            tile = cand
            break
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    kernel = functools.partial(_ball_kernel, radius=radius, nsample=nsample)
    idx, cnt = pl.pallas_call(
        kernel,
        grid=(b, m // tile),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, nsample), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
        ),
        interpret=interpret,
    )(xyz_t, new_xyz.astype(jnp.float32))
    return idx, cnt[..., 0]


def _ball_group_kernel(
    xyz_ref, new_xyz_ref, split_ref, idx_ref, cnt_ref, gx_ref, gy_ref, gz_ref,
    *, radius, nsample
):
    # Like _ball_kernel, but also emits centered grouped coordinates as three
    # [1, T, K] outputs (a single [T, K, 3] block would pad 3 lanes to 128 —
    # 42x VMEM waste; the host-side stack to [B, M, K, 3] is one cheap copy).
    #
    # Coordinate extraction rides the MXU: each round's one-hot selection mask
    # (needed for the key update anyway) matmuls against the 3-term bf16 split
    # of the coordinates (split_ref, [N, 16]: x0 y0 z0 x1 y1 z1 x2 y2 z2 pad).
    # One-hot rows make every f32-accumulated product exact, and the 3-term
    # split reconstructs the f32 coordinate bit-exactly (the onehot.py
    # convention) — vs the earlier six masked where+reduce VPU passes per
    # round, this leaves ~4 VPU passes/round and puts the rest on the idle MXU
    # (measured ~1.9x at SA1 shapes on v5e).
    x = xyz_ref[0, 0, :][None, :]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    q = new_xyz_ref[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]

    n = x.shape[-1]
    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2
    d = jnp.maximum(jnp.sqrt(d2), 1e-20)
    hit = d < radius

    cnt_total = jnp.sum(hit.astype(jnp.int32), axis=1)
    cnt_ref[0, :, 0] = jnp.minimum(cnt_total, nsample).astype(jnp.int32)

    split = split_ref[0]  # [N, 16] bf16

    col = jax.lax.broadcasted_iota(jnp.int32, hit.shape, dimension=1)
    big = jnp.int32(n)
    keys = jnp.where(hit, col, big)
    cols, gx, gy, gz = [], [], [], []
    for _ in range(nsample):
        mk = jnp.min(keys, axis=1)  # [T]; == n when exhausted
        sel = keys == mk[:, None]  # one lane per row (or none when exhausted)
        selb = jnp.where(sel, 1.0, 0.0).astype(jnp.bfloat16)  # exact one-hot
        ext = jax.lax.dot_general(
            selb, split,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 16]
        gx.append(ext[:, 0] + ext[:, 3] + ext[:, 6])  # exact f32 rebuild
        gy.append(ext[:, 1] + ext[:, 4] + ext[:, 7])
        gz.append(ext[:, 2] + ext[:, 5] + ext[:, 8])
        cols.append(mk)
        keys = jnp.where(sel, big, keys)
    idx = jnp.stack(cols, axis=1)  # [T, K]
    gx_a = jnp.stack(gx, axis=1)  # [T, K]
    gy_a = jnp.stack(gy, axis=1)
    gz_a = jnp.stack(gz, axis=1)

    valid = idx < n  # [T, K]
    first_hit = jnp.where(cnt_total > 0, idx[:, 0], 0)
    idx_ref[0, :, :] = jnp.where(valid, idx, first_hit[:, None]).astype(jnp.int32)

    # Padding repeats the FIRST hit's coordinates; rows with zero hits pad
    # with point 0's coordinates.  All masking stays 2-D per coordinate
    # (Mosaic cannot broadcast bool vectors into a new trailing dim).
    has = cnt_total > 0  # [T]
    fx = jnp.where(has, gx_a[:, 0], x[0, 0])  # [T]
    fy = jnp.where(has, gy_a[:, 0], y[0, 0])
    fz = jnp.where(has, gz_a[:, 0], z[0, 0])
    gx_ref[0, :, :] = jnp.where(valid, gx_a, fx[:, None]) - qx
    gy_ref[0, :, :] = jnp.where(valid, gy_a, fy[:, None]) - qy
    gz_ref[0, :, :] = jnp.where(valid, gz_a, fz[:, None]) - qz


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def query_ball_group_pallas(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused ball query + centered grouping.

    Returns (grouped_xyz[B,M,K,3] centered on new_xyz, idx[B,M,K],
    pts_cnt[B,M]) — grouped_xyz == group_point(xyz, idx) − new_xyz[:, :, None].
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    tile = m
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if m % cand == 0:
            tile = cand
            break
    xyz_f = xyz.astype(jnp.float32)
    xyz_t = jnp.transpose(xyz_f, (0, 2, 1))
    # 3-term bf16 split of the coordinates, packed [B, N, 16]
    # (x0 y0 z0 x1 y1 z1 x2 y2 z2 + 7 zero lanes): the in-kernel one-hot
    # matmul against this reconstructs f32 coordinates bit-exactly.
    # MUST round via lax.reduce_precision: under jit XLA's excess-precision
    # rule folds f32->bf16->f32 convert chains to identity, which silently
    # zeroes the residual terms (measured: bf16-level 7.6e-3 error).
    h0 = jax.lax.reduce_precision(xyz_f, 8, 7)
    r1 = xyz_f - h0
    h1 = jax.lax.reduce_precision(r1, 8, 7)
    t2 = (r1 - h1).astype(jnp.bfloat16)
    split = jnp.concatenate(
        [
            h0.astype(jnp.bfloat16),
            h1.astype(jnp.bfloat16),
            t2,
            jnp.zeros((b, n, 7), jnp.bfloat16),
        ],
        axis=-1,
    )
    kernel = functools.partial(_ball_group_kernel, radius=radius, nsample=nsample)
    coord_spec = pl.BlockSpec(
        (1, tile, nsample), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    coord_shape = jax.ShapeDtypeStruct((b, m, nsample), jnp.float32)
    idx, cnt, gx, gy, gz = pl.pallas_call(
        kernel,
        grid=(b, m // tile),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, nsample), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, nsample), jnp.int32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
            coord_shape, coord_shape, coord_shape,
        ),
        interpret=interpret,
    )(xyz_t, new_xyz.astype(jnp.float32), split)
    grouped = jnp.stack([gx, gy, gz], axis=-1)
    return grouped, idx, cnt[..., 0]
