"""Ball query, grouping, and k-nearest-neighbors.

Behavioral reference: /root/reference/pointnet2/tf_ops/grouping/
(`tf_grouping_g.cu:3-36` query_ball_point, `:40-78` group_point (+ atomicAdd
gradient), `:83-123` selection sort; python wrappers `tf_grouping.py:9-74`)
and DGCNN's dense-matrix kNN (`dgcnn/utils/tf_util.py:638-680`).

Exact semantics preserved:
  * Ball query takes the FIRST ``nsample`` points (in original point order)
    with ``max(dist, 1e-20) < radius``; on the first hit the whole row is
    pre-filled with that index so under-full balls repeat the first hit
    (tf_grouping_g.cu:26-29).  ``pts_cnt`` is the capped hit count.  (The CUDA
    kernel leaves rows with zero hits uninitialized — undefined behavior; we
    define them as index 0.)
  * ``knn_point`` returns the k smallest distances in ascending order with
    ties broken toward lower index (the reference's partial selection sort,
    tf_grouping_g.cu:83-123; ``lax.top_k`` has the same first-occurrence tie
    rule).
  * ``group_point`` gathers and its autodiff VJP is the reference's
    scatter-add gradient.

TPU notes: pairwise distances use the -2·x·yᵀ + |x|² + |y|² expansion so the
inner product rides the MXU; the rank-of-hit selection is a cumsum + counting
comparison that XLA fuse-reduces without materializing the [B,M,N,K]
comparison tensor.  Blocked Pallas kNN for large N lives in
ops/pallas/knn_kernel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "pairwise_squared_distance",
    "query_ball_point",
    "group_point",
    "knn_point",
    "knn_graph",
]


def pairwise_squared_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [..., M, N] between a:[..., M, C] and
    b:[..., N, C], computed as |a|² - 2a·bᵀ + |b|² (MXU-friendly).

    Cancellation in the expansion leaves ~1e-7 absolute error near zero (the
    CUDA kernels' (a-b)² formulation is exact there), so self-distances are
    not exactly 0; irrelevant at the benchmark's radii (0.1-0.8) but ball
    queries with radius < ~1e-3 can differ from the reference.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    # Full-precision inner product: the TPU default bf16 matmul would add
    # ~1e-2 relative error to d², flipping hit/neighbor decisions near ball
    # boundaries (the benchmark radii are 0.1-0.8 on unit-sphere clouds).
    inner = jnp.einsum(
        "...mc,...nc->...mn", a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    aa = jnp.sum(jnp.square(a), axis=-1)[..., :, None]
    bb = jnp.sum(jnp.square(b), axis=-1)[..., None, :]
    return jnp.maximum(aa - 2.0 * inner + bb, 0.0)


def query_ball_point(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-radius neighborhood query (backend-dispatching wrapper).

    On TPU with N >= 1024 the fused Pallas kernel wins (one HBM pass; 2.1x
    at SA1 shapes on v5e); below that XLA's fused counting formulation is
    faster (measured crossover).  Identical semantics either way
    (parity-tested against the CUDA-golden reference).
    """
    from scanobjectnn_tpu.ops.fps import _use_pallas

    if _use_pallas() and xyz.shape[1] >= 1024:
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import query_ball_pallas

        return query_ball_pallas(radius, nsample, xyz, new_xyz)
    return query_ball_point_lax(radius, nsample, xyz, new_xyz)


@partial(jax.jit, static_argnums=(0, 1))
def query_ball_point_lax(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-radius neighborhood query (lax/XLA counting formulation).

    Args:
      radius: ball radius (static).
      nsample: max points per ball (static).
      xyz: [B, N, 3] all points.
      new_xyz: [B, M, 3] query centers.

    Returns:
      idx: [B, M, nsample] int32 indices into N (first-nsample-in-order,
        padded by repeating the first hit).
      pts_cnt: [B, M] int32 number of unique hits (capped at nsample).
    """
    d2 = pairwise_squared_distance(new_xyz, xyz)  # [B, M, N]
    d = jnp.maximum(jnp.sqrt(d2), 1e-20)
    hit = d < radius  # [B, M, N]

    csum = jnp.cumsum(hit.astype(jnp.int32), axis=-1)  # [B, M, N]
    cnt_total = csum[..., -1]  # [B, M]
    pts_cnt = jnp.minimum(cnt_total, nsample)

    # Index of the k-th hit (0-based k) = #positions with csum < k+1; csum is
    # nondecreasing and increments exactly at hits, so this is a rank count.
    targets = jnp.arange(1, nsample + 1, dtype=jnp.int32)  # [K]
    idx = jnp.sum(
        (csum[..., None] < targets).astype(jnp.int32), axis=-2, dtype=jnp.int32
    )  # [B, M, K]

    first_hit = jnp.where(cnt_total > 0, idx[..., 0], 0)  # [B, M]
    k_range = jnp.arange(nsample, dtype=jnp.int32)
    valid = k_range[None, None, :] < cnt_total[..., None]
    idx = jnp.where(valid, idx, first_hit[..., None])
    return idx.astype(jnp.int32), pts_cnt.astype(jnp.int32)


def batched_index_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows per batch element: [B, N, C], [B, ...] -> [B, ..., C].

    This vmap'd advanced-indexing form lowers to an XLA gather with batching
    dims; on TPU it is ~100x faster than ``take_along_axis`` with a
    channel-broadcast index (which degrades catastrophically for C >> 1 —
    measured 476ms vs 4ms fwd at SA2 shapes on v5e), and its transpose is a
    fast scatter-add.
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)


def group_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Grouped gather: [B, N, C], [B, M, K] -> [B, M, K, C].

    Differentiable in ``points`` (VJP = scatter-add, matching
    GroupPointGrad's atomicAdd kernel tf_grouping_g.cu:61-78).
    """
    return batched_index_gather(points, idx)


def knn_point(
    k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest points in ``xyz`` for each query in ``new_xyz``.

    Returns ``(dist[B, M, k], idx[B, M, k])`` with SQUARED distances in
    ascending order (the reference's selection sort operates on the squared
    distance matrix built in tf_grouping.py:49-74).  Dispatches to the
    blocked Pallas kernel on TPU for large key sets.

    NOT differentiable: the reference op has no gradient (SelectionSort is
    index selection; tf_grouping.py registers none), and the Pallas path
    stop_gradients both point sets — so returned distances carry ZERO
    gradient on TPU.  The lax fallback happens to be differentiable in its
    distances; do not rely on that (it is backend/shape dependent via the
    dispatch guard).  Use ``group_point`` on the indices for differentiable
    neighbor features.
    """
    from scanobjectnn_tpu.ops.fps import _use_pallas

    if _use_pallas() and xyz.shape[1] >= 512 and new_xyz.shape[1] % 8 == 0:
        from scanobjectnn_tpu.ops.pallas.knn_kernel import knn_point_pallas

        return knn_point_pallas(lax.stop_gradient(new_xyz), lax.stop_gradient(xyz), k)
    return knn_point_lax(k, xyz, new_xyz)


@partial(jax.jit, static_argnums=0)
def knn_point_lax(
    k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """lax/XLA kNN (dense distance matrix + top_k)."""
    d2 = pairwise_squared_distance(new_xyz, xyz)  # [B, M, N]
    neg_vals, idx = lax.top_k(-d2, k)
    return -neg_vals, idx.astype(jnp.int32)


def knn_graph(features: jnp.ndarray, k: int) -> jnp.ndarray:
    """Self-kNN over a feature cloud [B, N, C] -> idx [B, N, k], INCLUDING the
    self edge as the nearest neighbor (DGCNN recomputes this per layer from
    feature space; dgcnn/utils/tf_util.py:638-680 takes top_k of the negated
    dense distance matrix, so each point's first neighbor is itself).

    On TPU with N >= 512 this dispatches to the blocked Pallas kernel — the
    [B, N, N] distance matrix + XLA top_k otherwise dominates DGCNN training.
    """
    from scanobjectnn_tpu.ops.fps import _use_pallas

    if _use_pallas() and features.shape[1] >= 512:
        from scanobjectnn_tpu.ops.pallas.knn_kernel import knn_graph_pallas

        # Indices are integers — no gradient exists (TF top_k likewise);
        # stop_gradient on the INPUT keeps tangents out of the Pallas call.
        return knn_graph_pallas(lax.stop_gradient(features), k)
    return knn_graph_lax(features, k)


@partial(jax.jit, static_argnums=1)
def knn_graph_lax(features: jnp.ndarray, k: int) -> jnp.ndarray:
    """lax/XLA self-kNN (dense distance matrix + top_k)."""
    d2 = pairwise_squared_distance(features, features)
    _, idx = lax.top_k(-d2, k)
    return idx.astype(jnp.int32)


def query_ball_group(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ball query + centered grouping of the coordinates in one op:
    returns (grouped_xyz[B,M,K,3] == group_point(xyz, idx) − new_xyz[:,:,None],
    idx, pts_cnt).

    On TPU with N >= 512 this dispatches to the fused Pallas kernel, which
    emits the grouped coordinates in-kernel (no separate gather).  NOTE: the
    fused path is not differentiable w.r.t. ``xyz`` — in the SA stack
    coordinates are data leaves, so no gradient flows there; use the lax
    path for exotic uses needing coordinate gradients.
    """
    from scanobjectnn_tpu.ops.fps import _use_pallas

    # Crossover re-measured after the MXU coordinate-extraction rework:
    # at SA2 shapes (N512 M128 K64) the kernel runs 1.9 ms vs 3.3 ms for
    # lax query + XLA gather, so the fused path wins from N >= 512.
    if _use_pallas() and xyz.shape[1] >= 512:
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import query_ball_group_pallas

        return query_ball_group_pallas(radius, nsample, xyz, new_xyz)
    idx, cnt = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped = group_point(xyz, idx) - new_xyz[:, :, None, :]
    return grouped, idx, cnt


def query_ball_group_multi(
    radii, nsamples, xyz: jnp.ndarray, new_xyz: jnp.ndarray
):
    """Multi-radius ball query + centered grouping (the MSG module's scales,
    ref pointnet_util.py:156): per-radius query_ball_group calls.

    A fully-fused multi-radius Pallas kernel (one shared distance
    computation + input load for all radii) was built and MEASURED A WASH
    in round 3 (6.12 vs 6.01 ms for both MSG layers' 6 groups at B16
    N1024, and ~10x the Mosaic compile time: 586 s for the MSG train
    step) — the shared d2 is a small fraction of the per-radius rank/slot
    work, so sharing it buys nothing.  Removed; see docs/KERNELS.md.
    Returns a tuple of (grouped_xyz, idx, pts_cnt) per radius, each
    identical to the single-radius op."""
    return tuple(
        query_ball_group(r, ns, xyz, new_xyz) for r, ns in zip(radii, nsamples)
    )
