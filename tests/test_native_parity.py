"""Native C++ kernels vs the numpy goldens vs the jax ops — a three-way
parity check mirroring the reference's standalone CPU/CUDA verification
harness (pointnet2/tf_ops/grouping/test/, SURVEY.md §4.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests import golden

native = pytest.importorskip("scanobjectnn_tpu.native")

if not native.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def _cloud(rng, b=3, n=64):
    return (rng.rand(b, n, 3).astype(np.float32) * 2 - 1)


def test_fps_three_way(rng):
    from scanobjectnn_tpu import ops

    xyz = _cloud(rng, b=3, n=96)
    got_native = native.fps(xyz, 24)
    got_golden = golden.fps_golden(xyz, 24)
    got_jax = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 24))
    np.testing.assert_array_equal(got_native, got_golden)
    np.testing.assert_array_equal(got_native, got_jax)


def test_query_ball_three_way(rng):
    from scanobjectnn_tpu import ops

    xyz = _cloud(rng, b=2, n=64)
    centers = xyz[:, :16]
    ni, nc = native.query_ball_point(0.4, 8, xyz, centers)
    gi, gc = golden.query_ball_golden(0.4, 8, xyz, centers)
    ji, jc = ops.query_ball_point(0.4, 8, jnp.asarray(xyz), jnp.asarray(centers))
    np.testing.assert_array_equal(ni, gi)
    np.testing.assert_array_equal(nc, gc)
    np.testing.assert_array_equal(ni, np.asarray(ji))
    np.testing.assert_array_equal(nc, np.asarray(jc))


def test_group_and_grad(rng):
    pts = rng.rand(2, 32, 5).astype(np.float32)
    idx = rng.randint(0, 32, (2, 8, 4)).astype(np.int32)
    out = native.group_point(pts, idx)
    np.testing.assert_allclose(out, golden.group_point_golden(pts, idx))
    g = np.ones_like(out)
    gp = native.group_point_grad(g, idx, 32)
    # Scatter-add: each point's grad equals its occurrence count per channel.
    counts = np.zeros((2, 32))
    for b in range(2):
        for i in idx[b].flatten():
            counts[b, i] += 1
    np.testing.assert_allclose(gp[..., 0], counts)


def test_selection_sort_knn(rng):
    d = rng.rand(2, 6, 20).astype(np.float32)
    out_d, out_i = native.selection_sort_knn(d, 4)
    order = np.argsort(d, axis=-1, kind="stable")[..., :4]
    np.testing.assert_array_equal(out_i, order)
    np.testing.assert_allclose(out_d, np.take_along_axis(d, order, axis=-1))


def test_three_nn_and_interpolate(rng):
    xyz1 = _cloud(rng, b=2, n=40)
    xyz2 = _cloud(rng, b=2, n=12)
    nd, ni = native.three_nn(xyz1, xyz2)
    gd, gi = golden.three_nn_golden(xyz1, xyz2)
    np.testing.assert_array_equal(ni, gi)
    np.testing.assert_allclose(nd, gd, rtol=1e-5)
    feats = rng.rand(2, 12, 6).astype(np.float32)
    w = rng.rand(2, 40, 3).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    out = native.three_interpolate(feats, ni, w)
    np.testing.assert_allclose(
        out, golden.three_interpolate_golden(feats, ni, w), rtol=1e-5
    )


def test_render_ball():
    xyzs = np.array([[50, 50, 10], [52, 52, 5]], np.int32)
    colors = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    img = native.render_ball(100, 100, xyzs, colors, radius=4)
    assert img.shape == (100, 100, 3)
    # Nearer point (z=10) wins the overlap: center pixel is red.
    assert img[50, 50, 0] == 255 and img[50, 50, 1] == 0
    # Non-overlapping part of the second ball is green ((54,54) is inside
    # ball 2's radius-4 disk but outside ball 1's).
    assert img[54, 54, 1] == 255
    # Background untouched.
    assert img[0, 0].sum() == 0
