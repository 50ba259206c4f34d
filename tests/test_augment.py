"""Augmentation tests: distributional semantics + invariances of the
pure-JAX transforms vs the reference numpy recipes (provider.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from scanobjectnn_tpu import augment


def _pts(b=4, n=32, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(b, n, 3).astype(np.float32))


def test_rotate_preserves_norm_and_y():
    pts = _pts()
    out = augment.rotate_point_cloud(jax.random.PRNGKey(0), pts)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(pts), axis=-1),
        rtol=1e-5,
    )
    # Rotation about y leaves the y coordinate unchanged.
    np.testing.assert_allclose(np.asarray(out)[..., 1], np.asarray(pts)[..., 1], rtol=1e-5)


def test_rotate_by_angle_matches_numpy_reference():
    """Exact parity with provider.rotate_point_cloud_by_angle (row-vector pc@R)."""
    pts = np.random.RandomState(1).randn(2, 16, 3).astype(np.float32)
    angle = 1.234
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
    want = pts @ rot
    got = np.asarray(augment.rotate_point_cloud_by_angle(jnp.asarray(pts), angle))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_jitter_bounded():
    pts = _pts()
    out = augment.jitter_point_cloud(jax.random.PRNGKey(0), pts, sigma=0.01, clip=0.05)
    delta = np.abs(np.asarray(out - pts))
    assert delta.max() <= 0.05 + 1e-6
    assert delta.max() > 0


def test_shift_per_cloud_constant():
    pts = _pts()
    out = augment.shift_point_cloud(jax.random.PRNGKey(0), pts, 0.1)
    shift = np.asarray(out - pts)
    # Shift constant within each cloud.
    np.testing.assert_allclose(
        shift, np.broadcast_to(shift[:, :1, :], shift.shape), atol=1e-5
    )
    assert np.abs(shift).max() <= 0.1 + 1e-5


def test_scale_isotropic_per_cloud():
    pts = _pts()
    out = augment.random_scale_point_cloud(jax.random.PRNGKey(0), pts, 0.8, 1.25)
    ratio = np.asarray(out) / np.asarray(pts)
    np.testing.assert_allclose(
        ratio, np.broadcast_to(ratio[:, :1, :1], ratio.shape), rtol=1e-4
    )
    assert (ratio >= 0.8 - 1e-5).all() and (ratio <= 1.25 + 1e-5).all()


def test_dropout_replaces_with_first_point():
    pts = _pts(b=8, n=64)
    out = np.asarray(augment.random_point_dropout(jax.random.PRNGKey(3), pts, 0.875))
    pts_np = np.asarray(pts)
    for b in range(8):
        first = pts_np[b, 0]
        for n in range(64):
            row = out[b, n]
            assert np.allclose(row, pts_np[b, n]) or np.allclose(row, first)


def test_shuffle_points_shared_permutation():
    pts = _pts(b=3, n=16)
    out = np.asarray(augment.shuffle_points(jax.random.PRNGKey(0), pts))
    # Every cloud got the SAME permutation: matching sort order recovers input.
    pts_np = np.asarray(pts)
    for b in range(3):
        assert {tuple(r) for r in out[b]} == {tuple(r) for r in pts_np[b]}
    perm0 = [np.where((pts_np[0] == out[0, i]).all(-1))[0][0] for i in range(16)]
    perm1 = [np.where((pts_np[1] == out[1, i]).all(-1))[0][0] for i in range(16)]
    assert perm0 == perm1


def test_outliers_fraction():
    pts = _pts(b=2, n=512) * 0.01  # tight cloud so outliers are detectable
    out = np.asarray(
        augment.insert_outliers_to_point_cloud(jax.random.PRNGKey(0), pts, 0.1)
    )
    moved = (np.abs(out) > 0.05).any(-1).mean()
    assert 0.03 < moved < 0.2


def test_compose_and_jit():
    fn = jax.jit(
        augment.compose(
            augment.rotate_point_cloud,
            augment.jitter_point_cloud,
            augment.shift_point_cloud,
        )
    )
    out = fn(jax.random.PRNGKey(0), _pts())
    assert out.shape == (4, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_occlude_collapses_cluster():
    pts = _pts(b=2, n=64)
    out = np.asarray(augment.occlude_point_cloud(jax.random.PRNGKey(1), pts, 0.25))
    # 25% of points were re-assigned; unique rows shrink accordingly.
    assert out.shape == (2, 64, 3)
    for b in range(2):
        n_unique = len({tuple(r) for r in out[b]})
        assert n_unique <= 64 - 16 + 1
