"""Component tests for the SpiderCNN / 3DmFV / PointCNN building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestTaylorBasis:
    def test_matches_reference_polynomials(self):
        """The 20-monomial order must match tf_util.py:216-222's grouping."""
        from scanobjectnn_tpu.models.spidercnn import taylor_basis

        d = np.array([[2.0, 3.0, 5.0]], np.float32)
        got = np.asarray(taylor_basis(jnp.asarray(d)))[0]
        x, y, z = 2.0, 3.0, 5.0
        want = [
            x, y, z, x * y * z, x * y, y * z, x * z, 1.0,
            x * x, y * y, z * z,
            x * x * y, x * y * y, x * x * z, x * z * z, y * y * z, y * z * z,
            x**3, y**3, z**3,
        ]
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestFisherVector:
    def _numpy_fv(self, points, w, mu, sigma):
        """Direct numpy transcription of tf_util.get_3dmfv (578-650)."""
        b, n, d = points.shape
        g = len(w)
        diff = (points[:, :, None, :] - mu[None, None]) / sigma[None, None]
        log_p = (
            -0.5 * (diff**2).sum(-1)
            - np.log(sigma).sum(-1)[None, None]
            - 0.5 * d * np.log(2 * np.pi)
        )
        p = np.exp(log_p)
        w_p = p * w[None, None]
        q = w_p / w_p.sum(-1, keepdims=True)
        d_pi_all = (q - w) / (np.sqrt(w) * n)
        d_pi = np.stack([d_pi_all.max(1), d_pi_all.sum(1)], -1)
        qd = q[..., None]
        d_mu_all = qd * diff / sigma
        mms = lambda x: np.concatenate([x.max(1), x.min(1), x.sum(1)], -1)
        d_mu = mms(d_mu_all) / (n * np.sqrt(w))[:, None]
        d_sig_all = qd * (diff**2 - 1)
        d_sigma = mms(d_sig_all) / (n * np.sqrt(2 * w))[:, None]

        def norm(x):
            x = np.sign(x) * np.sqrt(np.abs(x))
            return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

        fv = np.concatenate([norm(d_pi), norm(d_mu), norm(d_sigma)], 2)
        return np.swapaxes(fv, 1, 2)

    def test_matches_numpy(self, rng):
        from scanobjectnn_tpu.nn.fisher import fisher_vector, get_3d_grid_gmm

        gmm = get_3d_grid_gmm((3, 3, 3), 0.04)
        pts = (rng.rand(2, 64, 3) * 2 - 1).astype(np.float32)
        got = np.asarray(fisher_vector(jnp.asarray(pts), gmm.weights, gmm.means, gmm.stddevs))
        want = self._numpy_fv(
            pts.astype(np.float64), gmm.weights, gmm.means, gmm.stddevs
        )
        assert got.shape == (2, 20, 27)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_grid_gmm_layout(self):
        from scanobjectnn_tpu.nn.fisher import get_3d_grid_gmm

        gmm = get_3d_grid_gmm((5, 5, 5), 0.04)
        assert gmm.n_gaussians == 125
        np.testing.assert_allclose(gmm.weights.sum(), 1.0)
        # Grid centers span [-0.8, 0.8] at 5 subdivisions.
        assert gmm.means.min() == pytest.approx(-0.8)
        assert gmm.means.max() == pytest.approx(0.8)
        np.testing.assert_allclose(gmm.stddevs, 0.2)


class TestXConvHelpers:
    def test_unique_knn_skips_duplicates(self, rng):
        from scanobjectnn_tpu.nn.xconv import knn_indices_general

        pts = rng.rand(1, 8, 3).astype(np.float32)
        pts[0, 3] = pts[0, 1]  # duplicate of point 1
        pts[0, 6] = pts[0, 1]  # another duplicate
        q = pts[:, 1:2, :]
        _, idx = knn_indices_general(jnp.asarray(q), jnp.asarray(pts), 5, unique=True)
        chosen = set(np.asarray(idx)[0, 0].tolist())
        # The duplicate columns (3 and 6) must be suppressed.
        assert 3 not in chosen and 6 not in chosen
        assert 1 in chosen  # the first occurrence survives

    def test_sort_points_l2_and_cxyz(self, rng):
        from scanobjectnn_tpu.nn.xconv import sort_points
        from scanobjectnn_tpu import ops

        pts = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
        _, idx = ops.knn_point(6, pts, pts)
        sorted_idx = sort_points(pts, idx, "l2")
        assert sorted_idx.shape == idx.shape
        # l2 sorting orders by distance to the neighborhood mean.
        nn = np.asarray(ops.group_point(pts, sorted_idx))
        mean = nn.mean(axis=2, keepdims=True)
        d = np.linalg.norm(nn - mean, axis=-1)
        assert (np.diff(d, axis=-1) >= -1e-6).all()
        # cxyz keeps slot 0 (the query point) pinned first.
        cidx = sort_points(pts, idx, "cxyz")
        np.testing.assert_array_equal(np.asarray(cidx)[..., 0], np.asarray(idx)[..., 0])

    def test_inverse_density_sampling_bounds(self, rng):
        from scanobjectnn_tpu.nn.xconv import inverse_density_sample

        pts = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        idx = inverse_density_sample(jax.random.PRNGKey(0), pts, 8, 16)
        assert idx.shape == (2, 16)
        assert int(jnp.min(idx)) >= 0 and int(jnp.max(idx)) < 64


class TestPointCNNAugment:
    def test_xform_shapes_and_determinant(self):
        from scanobjectnn_tpu.augment import pointcnn_xforms

        xf, rot = pointcnn_xforms(jax.random.PRNGKey(0), 16)
        assert xf.shape == (16, 3, 3) and rot.shape == (16, 3, 3)
        # Rotations are orthonormal (det=1).
        dets = np.linalg.det(np.asarray(rot))
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)
        # Scaling is gaussian around 1 clipped at 3 sigma=0.3.
        sf = np.linalg.norm(np.asarray(xf), axis=1)  # column norms ~ scales
        assert (sf > 0.65).all() and (sf < 1.35).all()

    def test_augment_jitter_clipped(self):
        from scanobjectnn_tpu.augment import pointcnn_augment

        pts = jnp.ones((2, 32, 3))
        out = pointcnn_augment(
            jax.random.PRNGKey(0), pts, jitter_range=0.01,
            rotation_range=(0.0, 0.0, 0.0, "u"), scaling_range=(0.0, 0.0, 0.0, "u"),
        )
        delta = np.abs(np.asarray(out) - 1.0)
        assert delta.max() <= 0.05 + 1e-6 and delta.max() > 0


class TestSpiderTopK:
    def test_topk_pool(self, rng):
        from scanobjectnn_tpu.models.spidercnn import topk_pool

        feat = jnp.asarray(rng.rand(2, 16, 4).astype(np.float32))
        out = np.asarray(topk_pool(feat, k=2))
        assert out.shape == (2, 4, 2)
        want = np.sort(np.asarray(feat), axis=1)[:, ::-1, :][:, :2, :]
        np.testing.assert_allclose(out, np.swapaxes(want, 1, 2), rtol=1e-6)


class TestAuctionMatch:
    def test_perfect_match_on_permutation(self, rng):
        from scanobjectnn_tpu.ops.emd import auction_match, emd_loss

        pts = jnp.asarray(rng.rand(2, 24, 3).astype(np.float32))
        perm = rng.permutation(24)
        shuffled = pts[:, perm, :]
        matchl, matchr = auction_match(pts, shuffled)
        ml = np.asarray(matchl)
        # Each bidder's matched item must be its own permuted copy.
        inv = np.argsort(perm)
        np.testing.assert_array_equal(ml, np.tile(inv[None], (2, 1)))
        loss = float(emd_loss(pts, shuffled))
        assert loss < 1e-5

    def test_match_is_permutation(self, rng):
        from scanobjectnn_tpu.ops.emd import auction_match

        a = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
        matchl, _ = auction_match(a, b)
        for row in np.asarray(matchl):
            assert len(set(row.tolist())) == 32  # a true assignment

    def test_emd_beats_random_pairing(self, rng):
        from scanobjectnn_tpu.ops.emd import emd_loss

        a = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
        matched = float(emd_loss(a, b))
        identity = float(jnp.mean(jnp.linalg.norm(a - b, axis=-1)))
        assert matched <= identity + 1e-6


class TestGMMVariants:
    """GMM library completeness (3DmFV-Net/utils/utils.py:10-119)."""

    def test_2d_grid(self):
        from scanobjectnn_tpu.nn import fisher

        g = fisher.get_2d_grid_gmm((4, 4), variance=0.04)
        assert g.means.shape == (16, 2)
        assert g.weights.shape == (16,)
        np.testing.assert_allclose(g.weights, 1 / 16)
        # Centers are the 4x4 cell midpoints of [-1,1]^2.
        np.testing.assert_allclose(sorted(set(np.round(g.means[:, 0], 6))),
                                   [-0.75, -0.25, 0.25, 0.75])
        np.testing.assert_allclose(g.stddevs, np.sqrt(0.04))

    def test_learned_gmm_recovers_blobs(self):
        from scanobjectnn_tpu.nn import fisher

        rng = np.random.RandomState(0)
        centers = np.array([[-0.6, -0.6, -0.6], [0.6, 0.6, 0.6]])
        pts = np.concatenate(
            [c + 0.05 * rng.randn(500, 3) for c in centers], axis=0
        )
        g = fisher.get_learned_gmm(pts, 2, seed=1)
        assert g.means.shape == (2, 3)
        np.testing.assert_allclose(sorted(g.weights), [0.5, 0.5], atol=0.05)
        got = np.array(sorted(g.means.tolist()))
        np.testing.assert_allclose(got, centers, atol=0.05)
        assert (g.stddevs < 0.2).all()

    def test_get_gmm_dispatch(self):
        from scanobjectnn_tpu.nn import fisher

        g3 = fisher.get_gmm(None, 3, type="grid", variance=0.05, d=3)
        assert g3.means.shape == (27, 3)
        g2 = fisher.get_gmm(None, 3, type="grid", d=2)
        assert g2.means.shape == (9, 2)
        pts = np.random.RandomState(0).randn(200, 3) * 0.1
        gl = fisher.get_gmm(pts, 4, type="learn")
        assert gl.means.shape == (4, 3)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            fisher.get_gmm(None, 3, type="nope")

    def test_fisher_vector_works_with_learned_gmm(self):
        import jax.numpy as jnp
        from scanobjectnn_tpu.nn import fisher

        rng = np.random.RandomState(0)
        g = fisher.get_learned_gmm(rng.randn(300, 3) * 0.3, 8, seed=0)
        pts = jnp.asarray(rng.randn(2, 64, 3) * 0.3, jnp.float32)
        fv = fisher.fisher_vector(pts, g.weights, g.means, g.stddevs)
        assert fv.shape == (2, 20, 8)
        assert np.isfinite(np.asarray(fv)).all()


class TestFVPlots:
    """3DmFV diagnostic plots (visualization.py:44-327) render headless."""

    def test_all_plots_write_files(self, rng, tmp_path):
        import jax.numpy as jnp

        from scanobjectnn_tpu.nn import fisher
        from scanobjectnn_tpu.viz import fvplots

        gmm = fisher.get_3d_grid_gmm((3, 3, 3), 0.04)
        pts = rng.rand(2, 64, 3).astype(np.float32) * 2 - 1
        fv = fisher.fisher_vector(jnp.asarray(pts), gmm.weights, gmm.means, gmm.stddevs)
        assert fv.shape == (2, 20, 27)

        out = str(tmp_path / "fv.png")
        fvplots.visualize_fv(np.asarray(fv), out, labels=["a", "b"])
        assert (tmp_path / "fv.png").exists()

        fvplots.draw_gaussians(gmm, str(tmp_path / "gmm.png"), points=pts[0])
        assert (tmp_path / "gmm.png").exists()

        fvplots.visualize_pc(pts[0], str(tmp_path / "pc.png"), title="cloud")
        assert (tmp_path / "pc.png").exists()

        seg = rng.randint(0, 4, 64)
        cmap = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]]
        fvplots.visualize_pc_seg(pts[0], seg, cmap, str(tmp_path / "seg.png"))
        assert (tmp_path / "seg.png").exists()

        fvplots.visualize_pc_seg_diff(
            pts[0], seg, rng.randint(0, 4, 64), str(tmp_path / "diff.png")
        )
        assert (tmp_path / "diff.png").exists()

    def test_row_labels_match_fv_layout(self):
        from scanobjectnn_tpu.nn.fisher import FV_FEATURES
        from scanobjectnn_tpu.viz.fvplots import MINMAX_DERIVATIVE_LABELS

        assert len(MINMAX_DERIVATIVE_LABELS) == FV_FEATURES


class TestInterpCheck:
    """FP-interpolation visual check (visu_interpolation.py equivalent)."""

    def test_anchor_colors_are_exact_and_pngs_written(self, tmp_path):
        import numpy as np

        from scanobjectnn_tpu.viz import interp_check

        xyz2 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32)
        colors2 = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
        # A query AT an anchor reproduces the anchor color exactly (IDW with
        # the 1e-10 clamp -> weight 1 on the coincident point).
        got = interp_check.interpolated_colors(xyz2, xyz2, colors2)
        np.testing.assert_allclose(got, colors2, atol=1e-6)
        # Interpolated colors are convex combinations of the anchors.
        rng = np.random.RandomState(0)
        q = rng.random_sample((24, 3)).astype(np.float32)
        mixed = interp_check.interpolated_colors(q, xyz2, colors2)
        assert mixed.min() >= -1e-6 and mixed.max() <= 1 + 1e-6

        paths = interp_check.main(str(tmp_path))
        assert len(paths) == 3
        for p in paths:
            head = open(p, "rb").read(8)
            assert head == b"\x89PNG\r\n\x1a\n"
