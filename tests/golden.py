"""Golden numpy implementations of the reference's custom ops.

These mirror the CUDA/C++ kernel semantics line for line conceptually
(sequential loops, original point order, exact padding rules) so the
vectorized TPU ops can be parity-tested against them:

  * farthest_point_sample: tf_sampling_g.cu:105-170
  * query_ball_point: tf_grouping_g.cu:3-36 (incl. fill-row-on-first-hit)
  * group_point: tf_grouping_g.cu:40-57
  * selection-sort kNN: tf_grouping_g.cu:83-123
  * three_nn / three_interpolate: tf_interpolate.cpp:57-130
"""

from __future__ import annotations

import numpy as np


def fps_golden(xyz: np.ndarray, npoint: int) -> np.ndarray:
    b, n, _ = xyz.shape
    idx = np.zeros((b, npoint), dtype=np.int32)
    for i in range(b):
        temp = np.full(n, 1e38, dtype=np.float32)
        old = 0
        idx[i, 0] = 0
        for j in range(1, npoint):
            d = np.sum((xyz[i] - xyz[i, old]) ** 2, axis=-1).astype(np.float32)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            idx[i, j] = old
    return idx


def query_ball_golden(
    radius: float, nsample: int, xyz1: np.ndarray, xyz2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    idx = np.zeros((b, m, nsample), dtype=np.int32)
    pts_cnt = np.zeros((b, m), dtype=np.int32)
    for i in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                if cnt == nsample:
                    break
                d = max(np.sqrt(np.sum((xyz2[i, j] - xyz1[i, k]) ** 2)), 1e-20)
                if d < radius:
                    if cnt == 0:
                        idx[i, j, :] = k
                    idx[i, j, cnt] = k
                    cnt += 1
            pts_cnt[i, j] = cnt
    return idx, pts_cnt


def group_point_golden(points: np.ndarray, idx: np.ndarray) -> np.ndarray:
    b, m, k = idx.shape
    c = points.shape[-1]
    out = np.zeros((b, m, k, c), dtype=points.dtype)
    for i in range(b):
        out[i] = points[i][idx[i]]
    return out


def knn_golden(k: int, xyz1: np.ndarray, xyz2: np.ndarray):
    """Selection-sort semantics: k smallest squared distances, ties to the
    lowest original index, ascending order."""
    b, m = xyz2.shape[:2]
    dist = np.zeros((b, m, k), dtype=np.float32)
    idx = np.zeros((b, m, k), dtype=np.int32)
    for i in range(b):
        d2 = np.sum((xyz2[i][:, None, :] - xyz1[i][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :k]
        idx[i] = order
        dist[i] = np.take_along_axis(d2, order, axis=-1)
    return dist, idx


def three_nn_golden(xyz1: np.ndarray, xyz2: np.ndarray):
    dist, idx = knn_golden(3, xyz2, xyz1)
    return dist.astype(np.float32), idx


def three_interpolate_golden(points: np.ndarray, idx: np.ndarray, weight: np.ndarray):
    b, n, _ = idx.shape
    c = points.shape[-1]
    out = np.zeros((b, n, c), dtype=np.float64)
    for i in range(b):
        for j in range(n):
            for k in range(3):
                out[i, j] += weight[i, j, k] * points[i, idx[i, j, k]]
    return out.astype(points.dtype)
