"""ctypes bindings for the native C++ kernels (native/*.cpp).

The reference ships hand-written nvcc/g++ shell scripts and loads .so files
by path (tf_sampling_compile.sh; show3d_balls.py:24-26 ctypes).  Here the
shared objects build lazily via the checked-in Makefile on first use and are
exposed as numpy-in/numpy-out functions.  They are host-side tools: an
independent golden oracle for op parity tests and fast CPU data tooling —
the TPU compute path never calls them.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build(target: str) -> str:
    path = os.path.join(_NATIVE_DIR, target)
    if not os.path.exists(path):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, target],
            check=True,
            capture_output=True,
        )
    return path


@lru_cache(maxsize=None)
def _kernels() -> ctypes.CDLL:
    lib = ctypes.CDLL(_build("libpointkernels.so"))
    lib.fps.argtypes = [_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _i32p]
    lib.query_ball_point.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, _i32p, _i32p,
    ]
    lib.group_point.argtypes = [
        _f32p, _i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, _f32p,
    ]
    lib.group_point_grad.argtypes = list(lib.group_point.argtypes)
    lib.selection_sort_knn.argtypes = [
        _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _i32p,
    ]
    lib.three_nn.argtypes = [
        _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32p, _i32p,
    ]
    lib.three_interpolate.argtypes = [
        _f32p, _i32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, _f32p,
    ]
    return lib


@lru_cache(maxsize=None)
def _renderer() -> ctypes.CDLL:
    lib = ctypes.CDLL(_build("librenderballs.so"))
    lib.render_ball.argtypes = [
        ctypes.c_int, ctypes.c_int, _u8p, ctypes.c_int, _i32p,
        _f32p, _f32p, _f32p, ctypes.c_int,
    ]
    return lib


def available() -> bool:
    """True if the native library builds/loads on this host."""
    try:
        _kernels()
        return True
    except Exception:
        return False


def _c(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    xyz = _c(xyz, np.float32)
    b, n, _ = xyz.shape
    idx = np.zeros((b, npoint), np.int32)
    _kernels().fps(xyz, b, n, npoint, idx)
    return idx


def query_ball_point(radius: float, nsample: int, xyz1, xyz2):
    xyz1 = _c(xyz1, np.float32)
    xyz2 = _c(xyz2, np.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt = np.zeros((b, m), np.int32)
    _kernels().query_ball_point(xyz1, xyz2, b, n, m, radius, nsample, idx, cnt)
    return idx, cnt


def group_point(points, idx):
    points = _c(points, np.float32)
    idx = _c(idx, np.int32)
    b, n, c = points.shape
    _, m, nsample = idx.shape
    out = np.zeros((b, m, nsample, c), np.float32)
    _kernels().group_point(points, idx, b, n, c, m, nsample, out)
    return out


def group_point_grad(grad_out, idx, n):
    grad_out = _c(grad_out, np.float32)
    idx = _c(idx, np.int32)
    b, m, nsample, c = grad_out.shape
    out = np.zeros((b, n, c), np.float32)
    _kernels().group_point_grad(grad_out, idx, b, n, c, m, nsample, out)
    return out


def selection_sort_knn(dist, k):
    dist = _c(dist, np.float32)
    b, m, n = dist.shape
    out_d = np.zeros((b, m, k), np.float32)
    out_i = np.zeros((b, m, k), np.int32)
    _kernels().selection_sort_knn(dist, b, m, n, k, out_d, out_i)
    return out_d, out_i


def three_nn(xyz1, xyz2):
    xyz1 = _c(xyz1, np.float32)
    xyz2 = _c(xyz2, np.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    dist = np.zeros((b, n, 3), np.float32)
    idx = np.zeros((b, n, 3), np.int32)
    _kernels().three_nn(xyz1, xyz2, b, n, m, dist, idx)
    return dist, idx


def three_interpolate(points, idx, weight):
    points = _c(points, np.float32)
    idx = _c(idx, np.int32)
    weight = _c(weight, np.float32)
    b, m, c = points.shape
    n = idx.shape[1]
    out = np.zeros((b, n, c), np.float32)
    _kernels().three_interpolate(points, idx, weight, b, m, c, n, out)
    return out


def render_ball(h: int, w: int, xyzs, colors, radius: int = 5) -> np.ndarray:
    """Render int screen-space points [n,3] with [n,3] float colors."""
    xyzs = _c(xyzs, np.int32)
    colors = _c(colors, np.float32)
    show = np.zeros((h, w, 3), np.uint8)
    _renderer().render_ball(
        h, w, show, xyzs.shape[0], xyzs,
        _c(colors[:, 0], np.float32), _c(colors[:, 1], np.float32),
        _c(colors[:, 2], np.float32), radius,
    )
    return show
