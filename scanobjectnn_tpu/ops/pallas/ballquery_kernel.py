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
pointnet_util.py:44-47), removing the separate XLA gather (~4.7 ms at SA1
shapes) entirely.  Its selection is RANK-based: a block-triangular bf16
cumsum assigns each in-radius point its 1-based slot, and every slot's
coordinates + column index come out of one one-hot MXU matmul — no serial
K-round min-extraction chain (see _ball_group_kernel; the plain
``query_ball_pallas`` keeps the simpler min-extraction rounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["query_ball_pallas", "query_ball_group_pallas"]


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


def _rank_inclusive(hit, tri):
    """rank[t, i] = #hits at columns <= i (inclusive cumsum of hit): one
    INDEPENDENT [T, W] @ [W, W] bf16 matmul per block (values <= 256 per
    block exact in bf16) + exact f32 block offsets accumulated with cheap
    [T, 1] adds — no serial matmul chain.  Shared by the ball-group kernel
    and the fused SA-layer kernel (safused_kernel.py)."""
    n = hit.shape[-1]
    w = tri.shape[0]
    hitb = jnp.where(hit, 1.0, 0.0).astype(jnp.bfloat16)
    cjs = [
        jax.lax.dot_general(
            hitb[:, j * w : (j + 1) * w], tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for j in range(n // w)
    ]
    blocks = []
    base = jnp.zeros((hit.shape[0], 1), jnp.float32)
    for j in range(n // w):
        blocks.append(cjs[j] + base)
        base = base + cjs[j][:, w - 1 : w]
    return jnp.concatenate(blocks, axis=1)


def _emit_radius(
    d2, radius, nsample, split, tri, qx, qy, qz, x, y, z,
    idx_ref, cnt_ref, gx_ref, gy_ref, gz_ref, gxs_ref, gys_ref, gzs_ref, cs_ref,
):
    """Tail of the ball-group kernel: hit mask, rank cumsum, independent
    slot extraction, padding, and output stores, given the precomputed
    squared distances.  (A fused multi-radius variant sharing ``d2`` across
    the MSG scales measured a WASH at 10x the compile time — removed,
    numbers in ops/grouping.query_ball_group_multi and docs/KERNELS.md.)"""
    n = x.shape[-1]
    # No sqrt: max(sqrt(d2), 1e-20) < radius  ⇔  d2 < radius² for any
    # radius > 1e-20 (sqrt is monotone; the clamp only moves d2 < 1e-40,
    # still a hit).  Exact-parity measured vs the sqrt form.
    hit = d2 < radius * radius

    cnt_total = jnp.sum(hit.astype(jnp.int32), axis=1)
    cnt_ref[0, :, 0] = jnp.minimum(cnt_total, nsample).astype(jnp.int32)

    rank = _rank_inclusive(hit, tri)  # [T, N] f32, exact ints
    # NOTE a bf16 slot array (clamped to nsample+1, exact; two sublanes per
    # vreg → half-cost eq/select passes) fails Mosaic lowering: the i1 mask
    # of a (16,128)-tiled bf16 compare trips an "invalid relayout" on this
    # toolchain.  Keep f32.
    slot = jnp.where(hit, rank, jnp.float32(0.0))  # 1-based slot per hit

    # Slot loop.  K <= 64 fully unrolls with direct stacking — best ILP and
    # (round-3 measurement) MUCH faster Mosaic compile than the chunked
    # fori_loop at K=64 (5 s vs ~8 min in a 30-call chain program) at
    # slightly better runtime (3.23 vs 3.51 ms at SA2 B=128).  Larger K
    # (MSG's 128) uses a fori_loop over 16-slot unrolled chunks; chunk
    # results land TRANSPOSED ([K, T] scratch, one sublane row per slot —
    # dynamic stores are legal at sublane granularity) and transpose back
    # at the end.
    def slot_ext(kf):
        selb = jnp.where(slot == kf, 1.0, 0.0).astype(
            jnp.bfloat16
        )  # exact one-hot (empty when the row has < k+1 hits)
        return jax.lax.dot_general(
            selb, split,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 16]

    if nsample <= 64:
        exts = [slot_ext(jnp.float32(k + 1)) for k in range(nsample)]
        gx_a = jnp.stack([e[:, 0] + e[:, 3] + e[:, 6] for e in exts], axis=1)
        gy_a = jnp.stack([e[:, 1] + e[:, 4] + e[:, 7] for e in exts], axis=1)
        gz_a = jnp.stack([e[:, 2] + e[:, 5] + e[:, 8] for e in exts], axis=1)
        idx = jnp.stack(
            [e[:, 9] + e[:, 10] for e in exts], axis=1
        ).astype(jnp.int32)  # [T, K]
    else:
        chunk = 16

        def slot_chunk(j, _):
            base_k = j * chunk
            exts = [
                slot_ext((base_k + (u + 1)).astype(jnp.float32))
                for u in range(chunk)
            ]
            rows = pl.ds(base_k, chunk)
            gxs_ref[rows, :] = jnp.stack(
                [e[:, 0] + e[:, 3] + e[:, 6] for e in exts], axis=0
            )
            gys_ref[rows, :] = jnp.stack(
                [e[:, 1] + e[:, 4] + e[:, 7] for e in exts], axis=0
            )
            gzs_ref[rows, :] = jnp.stack(
                [e[:, 2] + e[:, 5] + e[:, 8] for e in exts], axis=0
            )
            cs_ref[rows, :] = jnp.stack(
                [e[:, 9] + e[:, 10] for e in exts], axis=0
            )
            return 0

        jax.lax.fori_loop(0, gxs_ref.shape[0] // chunk, slot_chunk, 0)
        idx = cs_ref[:, :].T[:, :nsample].astype(jnp.int32)  # [T, K]
        gx_a = gxs_ref[:, :].T[:, :nsample]  # [T, K]
        gy_a = gys_ref[:, :].T[:, :nsample]
        gz_a = gzs_ref[:, :].T[:, :nsample]

    krange = jax.lax.broadcasted_iota(jnp.int32, idx.shape, dimension=1)
    valid = krange < cnt_total[:, None]  # [T, K]
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


def _ball_group_kernel(
    xyz_ref, new_xyz_ref, split_ref, tri_ref, idx_ref, cnt_ref,
    gx_ref, gy_ref, gz_ref, gxs_ref, gys_ref, gzs_ref, cs_ref,
    *, radius, nsample
):
    # Like _ball_kernel, but also emits centered grouped coordinates as three
    # [1, T, K] outputs (a single [T, K, 3] block would pad 3 lanes to 128 —
    # 42x VMEM waste; the host-side stack to [B, M, K, 3] is one cheap copy).
    #
    # Selection is RANK-based, not sequential min-extraction: the hit cumsum
    # (each hit's 1-based position among the row's hits, in original point
    # order) is computed with block-triangular bf16 matmuls (values <= 256
    # per block are exact in bf16, block offsets exact in f32), after which
    # the K slot extractions are INDEPENDENT — slot k's one-hot is just
    # (rank == k+1) — so there is no serial K-round dependency chain, ~2 VPU
    # passes per slot, and both the coordinates AND the column index come out
    # of one one-hot matmul per slot against the packed bf16 split
    # (split_ref [N, 16]: x0 y0 z0 x1 y1 z1 x2 y2 z2 c0 c1; the 3-term
    # coordinate split and 2-term column split reconstruct f32 bit-exactly,
    # the onehot.py convention).
    #
    # MXU roofline note (measured round 3): the K slot matmuls run at the
    # MXU tile-step rate (~20.6 cycles per [128,128] step, i.e. peak) — the
    # extraction is MXU-throughput-bound at K·N/128 steps per query tile, so
    # further speedup requires algorithmically fewer contraction steps, not
    # scheduling.  See BENCHMARKS.md.
    x = xyz_ref[0, 0, :][None, :]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    q = new_xyz_ref[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]

    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2
    _emit_radius(
        d2, radius, nsample, split_ref[0], tri_ref[...], qx, qy, qz, x, y, z,
        idx_ref, cnt_ref, gx_ref, gy_ref, gz_ref,
        gxs_ref, gys_ref, gzs_ref, cs_ref,
    )


def _split_and_tri(xyz_f, b, n):
    """Packed bf16 split of coordinates + column index, and the
    block-triangular cumsum matrix — the ball-group kernel's static inputs.

    3-term bf16 split of the coordinates + 2-term split of the column
    index, packed [B, N, 16] (x0 y0 z0 x1 y1 z1 x2 y2 z2 c0 c1 + 5 zero
    lanes): the in-kernel one-hot matmuls against this reconstruct the f32
    coordinates and the integer column bit-exactly.  MUST round via
    lax.reduce_precision: under jit XLA's excess-precision rule folds
    f32->bf16->f32 convert chains to identity, which silently zeroes the
    residual terms (measured: bf16-level 7.6e-3 error)."""
    h0 = jax.lax.reduce_precision(xyz_f, 8, 7)
    r1 = xyz_f - h0
    h1 = jax.lax.reduce_precision(r1, 8, 7)
    t2 = (r1 - h1).astype(jnp.bfloat16)
    colf = jnp.arange(n, dtype=jnp.float32)[None, :, None]  # [1, N, 1]
    c0 = jax.lax.reduce_precision(colf, 8, 7)
    c1 = colf - c0  # integer <= 2^11: 2-term split exact
    cols2 = jnp.broadcast_to(
        jnp.concatenate([c0, c1], axis=-1), (b, n, 2)
    ).astype(jnp.bfloat16)
    split = jnp.concatenate(
        [
            h0.astype(jnp.bfloat16),
            h1.astype(jnp.bfloat16),
            t2,
            cols2,
            jnp.zeros((b, n, 5), jnp.bfloat16),
        ],
        axis=-1,
    )
    # Upper-triangular-inclusive cumsum matrix for the rank matmuls.
    w = next(c for c in (256, 128, 64, 32, 16, 8, 4, 2, 1) if n % c == 0)
    tri = (
        jnp.arange(w, dtype=jnp.int32)[:, None]
        <= jnp.arange(w, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    return split, tri, w


def _qbg_call(radius, nsample, xyz, new_xyz, interpret):
    """pallas_call plumbing for the ball-group kernel.

    NOTE round-3 negative result: a feature-fused variant (feature lanes
    packed beside the coordinate split, grouped features emitted from the
    same per-slot matmuls) measured SLOWER than this kernel + the separate
    gather_neighbors at SA2 shapes (7.7-8.7 vs 5.8 ms at B=128 N512 M128
    K64 C128 bf16): the widened split costs a second MXU output tile per
    slot matmul and the per-slot padding selects add VPU passes.  Removed;
    numbers in docs/KERNELS.md."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    tile = m
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):  # t256 measured no faster, uses 2x VMEM
        if m % cand == 0:
            tile = cand
            break
    xyz_f = xyz.astype(jnp.float32)
    xyz_t = jnp.transpose(xyz_f, (0, 2, 1))
    split, tri, w = _split_and_tri(xyz_f, b, n)
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
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
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
        # The chunked slot loop's [K, T] transposed accumulators; the
        # K <= 64 unrolled branch never touches them, so shrink to the
        # 8-sublane minimum there instead of reserving dead VMEM.
        scratch_shapes=[
            pltpu.VMEM(
                (8 if nsample <= 64 else -(-nsample // 16) * 16, tile),
                jnp.float32,
            )
            for _ in range(4)  # gx gy gz col
        ],
        # The independent slot one-hots tempt Mosaic's scheduler into
        # keeping several [T, N] bf16 buffers live at once; give it room
        # beyond the 16 MB default scoped limit (v5e VMEM is 128 MB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xyz_t, new_xyz.astype(jnp.float32), split, tri)
    grouped = jnp.stack([gx, gy, gz], axis=-1)
    return grouped, idx, cnt[..., 0]


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
    return _qbg_call(radius, nsample, xyz, new_xyz, interpret)
