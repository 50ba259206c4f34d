"""Blocked self-kNN Pallas kernel for DGCNN's dynamic graphs.

Behavioral reference: dgcnn/utils/tf_util.py:638-680 — dense pairwise
distance matrix + top_k per layer, recomputed from feature space.  XLA's
top_k over the [B, N, N] matrix dominates DGCNN training (~13 ms per kNN at
B32/N1024 on v5e; five graphs per forward).

Kernel: grid (batch, query-tile).  The full feature cloud [N, C] stays in
VMEM; per query tile the [T, N] squared-distance block is one MXU matmul
plus norms, then k argmin-extraction rounds emit the neighbor indices
(single-lane extraction via argmin → exact, no tie double-select;
first-occurrence tie rule matches jnp.argmax/argmin and the reference's
top_k).  Distances never touch HBM.

The inner product runs in native f32 on the MXU (matching the HIGHEST
precision of the lax path — bf16 would flip neighbor decisions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_graph_pallas"]


def argmin_rows(d2, cols):
    """Manual two-reduce row argmin: row min, then the LOWEST column index
    attaining it — the same first-occurrence tie rule as jnp.argmin, but
    measurably cheaper than Mosaic's argmin lowering (the FPS analog cut
    the argmax marginal 0.83 -> 0.34 us/round at [128, 2048]; see
    docs/KERNELS.md round-5 FPS revision).  ``cols`` is the int32 column
    iota of d2's shape."""
    m = jnp.min(d2, axis=1, keepdims=True)
    return (
        jnp.min(jnp.where(d2 == m, cols, d2.shape[1]), axis=1).astype(
            jnp.int32
        ),
        m,
    )


def _knn_kernel(feats_ref, idx_ref, *, k: int, tile: int, grp: int):
    # feats_ref: [1, N, C] (whole cloud); idx_ref: [1, grp*T, k].  ``grp``
    # independent query tiles are processed with their k argmin rounds
    # interleaved — round r of tile g has no dependency on tile g', filling
    # the dependent-round latency bubbles (see edge_kernel._fwd_kernel).
    j = pl.program_id(1)
    feats = feats_ref[0]  # [N, C]
    kk = jnp.sum(feats * feats, axis=1)[None, :]  # [1, N]

    d2s, cols = [], []
    for g in range(grp):
        q = feats_ref[0, pl.ds((j * grp + g) * tile, tile), :]  # [T, C]
        qq = jnp.sum(q * q, axis=1, keepdims=True)  # [T, 1]
        inner = jax.lax.dot_general(
            q, feats,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32 MXU — bf16 flips neighbors
        )  # [T, N]
        d2s.append(jnp.maximum(qq - 2.0 * inner + kk, 0.0))
        cols.append(jax.lax.broadcasted_iota(jnp.int32, d2s[-1].shape, dimension=1))

    outs = [[] for _ in range(grp)]
    for _ in range(k):
        for g in range(grp):
            am, _ = argmin_rows(d2s[g], cols[g])  # [T]
            outs[g].append(am)
            d2s[g] = jnp.where(cols[g] == am[:, None], jnp.inf, d2s[g])
    for g in range(grp):
        idx_ref[0, g * tile:(g + 1) * tile, :] = jnp.stack(outs[g], axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def knn_graph_pallas(
    features: jnp.ndarray, k: int, interpret: bool = False
) -> jnp.ndarray:
    """Self-kNN (self edge included): [B, N, C] -> int32 [B, N, k]."""
    b, n, c = features.shape
    tile = n
    for cand in (256, 128, 64, 32, 16, 8):
        if n % cand == 0:
            tile = cand
            break
    # grp-interleave measured a wash for the self-kNN kernel (4.66 vs
    # 4.68 ms at B32 N1024 k20 C64) — keep 1 for the halved unroll/compile.
    grp = 1
    kernel = functools.partial(_knn_kernel, k=k, tile=tile, grp=grp)
    idx = pl.pallas_call(
        kernel,
        grid=(b, n // (grp * tile)),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, grp * tile, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        interpret=interpret,
    )(features.astype(jnp.float32))
    return lax.stop_gradient(idx)


def _dup_mask_kernel(xyz_ref, dup_ref, *, tile: int):
    # xyz_ref: [1, 3, N]; dup_ref: [1, G, tile] f32 (G = N/tile; tile row j
    # holds 1.0 where point j*tile+t duplicates an earlier point i<j*tile+t,
    # exact 3-coordinate equality).  Row store at sublane granularity.
    j = pl.program_id(1)
    x = xyz_ref[0, 0, :][None, :]  # [1, N]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    rows = pl.ds(j * tile, tile)
    xj = xyz_ref[0, 0, rows][:, None]  # [T, 1]
    yj = xyz_ref[0, 1, rows][:, None]
    zj = xyz_ref[0, 2, rows][:, None]

    eq = (xj == x) & (yj == y) & (zj == z)  # [T, N]
    col = lax.broadcasted_iota(jnp.int32, eq.shape, dimension=1)
    row = j * tile + lax.broadcasted_iota(jnp.int32, eq.shape, dimension=0)
    dup = jnp.any(eq & (col < row), axis=1)  # earlier exact twin exists
    dup_ref[0, pl.ds(j, 1), :] = jnp.where(dup, 1.0, 0.0)[None, :]


@functools.partial(jax.jit, static_argnums=(1,))
def duplicate_mask_pallas(
    xyz: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """[B, N, 3] -> f32 [B, N]: 1.0 where the point exactly duplicates an
    earlier (lower-index) point — PointCNN's unique-kNN suppression input
    (pointfly.py:131-146).  The XLA [B,N,N,3] equality formulation costs
    1.8 ms at B32/N1024 on v5e; this blocked version keeps everything in
    VMEM."""
    from scanobjectnn_tpu.ops.pallas.onehot import _pick_tile

    b, n, _ = xyz.shape
    tile = _pick_tile(n, biggest=256)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    kernel = functools.partial(_dup_mask_kernel, tile=tile)
    g = n // tile
    dup = pl.pallas_call(
        kernel,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, tile), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, tile), jnp.float32),
        interpret=interpret,
    )(xyz_t)
    return dup.reshape(b, n)


def _knn_general_kernel(q_ref, keys_ref, bias_ref, dist_ref, idx_ref, *,
                        k: int, tile: int, grp: int):
    # q_ref: [1, grp*T, C] query tiles; keys_ref: [1, N, C]; bias_ref:
    # [1, 1, N] per-key additive distance bias (duplicate suppression);
    # outputs [1, grp*T, k].  grp-way interleave as in _knn_kernel.
    keys = keys_ref[0]  # [N, C]
    kk = jnp.sum(keys * keys, axis=1)[None, :]
    bias = bias_ref[0]  # [1, N]

    d2s, cols = [], []
    for g in range(grp):
        q = q_ref[0, g * tile:(g + 1) * tile, :]  # [T, C]
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        inner = jax.lax.dot_general(
            q, keys,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2s.append(jnp.maximum(qq - 2.0 * inner + kk, 0.0) + bias)
        cols.append(jax.lax.broadcasted_iota(jnp.int32, d2s[-1].shape, dimension=1))

    idx_cols = [[] for _ in range(grp)]
    dist_cols = [[] for _ in range(grp)]
    for _ in range(k):
        for g in range(grp):
            am, m = argmin_rows(d2s[g], cols[g])  # [T], [T, 1]
            dist_cols[g].append(m[:, 0])
            idx_cols[g].append(am)
            d2s[g] = jnp.where(cols[g] == am[:, None], jnp.inf, d2s[g])
    for g in range(grp):
        rows = slice(g * tile, (g + 1) * tile)
        dist_ref[0, rows, :] = jnp.stack(dist_cols[g], axis=1)
        idx_ref[0, rows, :] = jnp.stack(idx_cols[g], axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def knn_point_pallas(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    k: int,
    interpret: bool = False,
    bias: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """General kNN: ([B,M,C] queries, [B,N,C] keys) -> (d²[B,M,k], idx[B,M,k]),
    ascending squared distances — the knn_point / three_nn contract.

    ``bias`` ([B, N], optional) is added to every query's distance row —
    PointCNN's duplicate-point suppression (pointfly.py:131-146) passes
    BIG·dup here; returned distances include the bias, matching the lax
    formulation in nn/xconv.knn_indices_general.
    """
    b, m, c = queries.shape
    n = keys.shape[1]
    tile = m
    for cand in (256, 128, 64, 32, 16, 8):
        if m % cand == 0:
            tile = cand
            break
    if bias is None:
        bias = jnp.zeros((b, n), jnp.float32)
    grp = 1  # see knn_graph_pallas: interleave measured a wash
    gt = grp * tile
    kernel = functools.partial(_knn_general_kernel, k=k, tile=tile, grp=grp)
    out_spec = pl.BlockSpec((1, gt, k), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b, m // gt),
        in_specs=[
            pl.BlockSpec((1, gt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.float32),
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
        ),
        interpret=interpret,
    )(
        queries.astype(jnp.float32),
        keys.astype(jnp.float32),
        bias.astype(jnp.float32)[:, None, :],
    )
    return dist, idx
