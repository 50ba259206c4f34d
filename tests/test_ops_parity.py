"""Parity of the lax/XLA ops against golden numpy implementations of the
reference CUDA/C++ kernel semantics (SURVEY.md §4 implication (a))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scanobjectnn_tpu import ops
from tests import golden


def _cloud(rng, b=3, n=64, scale=1.0):
    return (rng.rand(b, n, 3).astype(np.float32) * 2 - 1) * scale


class TestFPS:
    def test_matches_golden(self, rng):
        xyz = _cloud(rng, b=4, n=100)
        got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))
        want = golden.fps_golden(xyz, 16)
        np.testing.assert_array_equal(got, want)

    def test_starts_at_zero_and_unique(self, rng):
        xyz = _cloud(rng, b=2, n=50)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 10))
        assert (idx[:, 0] == 0).all()
        for row in idx:
            assert len(set(row.tolist())) == 10

    def test_npoint_one(self, rng):
        xyz = _cloud(rng, b=2, n=8)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 1))
        assert idx.shape == (2, 1) and (idx == 0).all()


class TestGather:
    def test_matches_take(self, rng):
        pts = _cloud(rng, b=2, n=32)
        idx = rng.randint(0, 32, (2, 7)).astype(np.int32)
        got = np.asarray(ops.gather_point(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[i][idx[i]] for i in range(2)])
        np.testing.assert_allclose(got, want)

    def test_grad_is_scatter_add(self, rng):
        pts = jnp.asarray(_cloud(rng, b=1, n=8))
        idx = jnp.asarray(np.array([[2, 2, 5]], dtype=np.int32))
        g = jax.grad(lambda p: ops.gather_point(p, idx).sum())(pts)
        expect = np.zeros((1, 8, 3))
        expect[0, 2] = 2.0  # index 2 gathered twice -> gradient accumulates
        expect[0, 5] = 1.0
        np.testing.assert_allclose(np.asarray(g), expect)


class TestQueryBall:
    @pytest.mark.parametrize("radius,nsample", [(0.3, 8), (0.5, 4), (0.1, 16)])
    def test_matches_golden(self, rng, radius, nsample):
        xyz = _cloud(rng, b=3, n=48)
        centers = np.stack([x[golden.fps_golden(xyz, 12)[i]] for i, x in enumerate([xyz[0], xyz[1], xyz[2]])])
        got_idx, got_cnt = ops.query_ball_point(
            radius, nsample, jnp.asarray(xyz), jnp.asarray(centers)
        )
        want_idx, want_cnt = golden.query_ball_golden(radius, nsample, xyz, centers)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)

    def test_empty_ball_defined(self, rng):
        # A far-away query center: golden CUDA leaves garbage; we define 0.
        xyz = jnp.asarray(_cloud(rng, b=1, n=16))
        far = jnp.full((1, 1, 3), 100.0)
        idx, cnt = ops.query_ball_point(0.1, 4, xyz, far)
        assert int(cnt[0, 0]) == 0
        assert (np.asarray(idx) == 0).all()

    def test_self_always_hits(self, rng):
        xyz = jnp.asarray(_cloud(rng, b=2, n=32))
        idx, cnt = ops.query_ball_point(0.05, 4, xyz, xyz)
        assert (np.asarray(cnt) >= 1).all()


class TestGroupPoint:
    def test_matches_golden(self, rng):
        pts = rng.rand(2, 24, 5).astype(np.float32)
        idx = rng.randint(0, 24, (2, 6, 4)).astype(np.int32)
        got = np.asarray(ops.group_point(jnp.asarray(pts), jnp.asarray(idx)))
        want = golden.group_point_golden(pts, idx)
        np.testing.assert_allclose(got, want)

    def test_grad_matches_numeric(self, rng):
        pts = jnp.asarray(rng.rand(1, 10, 3).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 10, (1, 4, 3)).astype(np.int32))
        f = lambda p: jnp.sum(jnp.sin(ops.group_point(p, idx)))
        g = jax.grad(f)(pts)
        eps = 1e-3
        for flat_i in [0, 7, 29]:
            d = np.zeros(pts.size, np.float32)
            d[flat_i] = eps
            d = d.reshape(pts.shape)
            num = (f(pts + d) - f(pts - d)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g).flatten()[flat_i], num, atol=1e-2)


class TestKNN:
    def test_matches_golden(self, rng):
        xyz = _cloud(rng, b=2, n=40)
        q = _cloud(rng, b=2, n=10)
        got_d, got_i = ops.knn_point(5, jnp.asarray(xyz), jnp.asarray(q))
        want_d, want_i = golden.knn_golden(5, xyz, q)
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)

    def test_knn_graph_self_first(self, rng):
        feats = jnp.asarray(rng.rand(2, 20, 8).astype(np.float32))
        idx = np.asarray(ops.knn_graph(feats, 4))
        np.testing.assert_array_equal(idx[..., 0], np.arange(20)[None].repeat(2, 0))


class TestThreeNN:
    def test_matches_golden(self, rng):
        xyz1 = _cloud(rng, b=2, n=30)
        xyz2 = _cloud(rng, b=2, n=12)
        got_d, got_i = ops.three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2))
        want_d, want_i = golden.three_nn_golden(xyz1, xyz2)
        np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)

    def test_interpolate_matches_golden(self, rng):
        pts = rng.rand(2, 12, 6).astype(np.float32)
        xyz1 = _cloud(rng, b=2, n=30)
        xyz2 = _cloud(rng, b=2, n=12)
        d, i = golden.three_nn_golden(xyz1, xyz2)
        from scanobjectnn_tpu.ops.interpolate import three_interpolate_weights

        w = np.asarray(three_interpolate_weights(jnp.asarray(d)))
        got = np.asarray(ops.three_interpolate(jnp.asarray(pts), jnp.asarray(i), jnp.asarray(w)))
        want = golden.three_interpolate_golden(pts, i, w)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_interpolate_gradcheck(self, rng):
        """Mirrors tf_interpolate_op_test.py:5-22 (gradient of interpolation
        w.r.t. the sparse features)."""
        pts = jnp.asarray(rng.rand(1, 8, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 8, (1, 16, 3)).astype(np.int32))
        w = jax.nn.softmax(jnp.asarray(rng.rand(1, 16, 3).astype(np.float32)), axis=-1)
        f = lambda p: jnp.sum(jnp.cos(ops.three_interpolate(p, idx, w)))
        g = jax.grad(f)(pts)
        eps = 1e-3
        for flat_i in [0, 13, 31]:
            d = np.zeros(pts.size, np.float32)
            d[flat_i] = eps
            d = d.reshape(pts.shape)
            num = (f(pts + d) - f(pts - d)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g).flatten()[flat_i], num, atol=1e-2)


class TestProbSample:
    def test_inverse_cdf(self, rng):
        probs = rng.rand(2, 10).astype(np.float32)
        probs /= probs.sum(-1, keepdims=True)
        cdf = np.cumsum(probs, axis=-1)
        u = rng.rand(2, 1000).astype(np.float32)
        idx = np.asarray(ops.prob_sample(jnp.asarray(cdf), jnp.asarray(u)))
        assert idx.min() >= 0 and idx.max() < 10
        # Empirical frequencies approximate the pdf.
        freq = np.bincount(idx[0], minlength=10) / 1000
        np.testing.assert_allclose(freq, probs[0], atol=0.06)

    def test_pdf_adapter_matches_cdf_form(self, rng):
        """prob_sample_pdf takes the reference wrapper's unnormalized pdf
        (tf_sampling.py:14-23) and must equal cumsum-then-prob_sample."""
        pdf = rng.rand(2, 10).astype(np.float32) * 3.0  # unnormalized
        u = rng.rand(2, 200).astype(np.float32)
        got = np.asarray(ops.prob_sample_pdf(jnp.asarray(pdf), jnp.asarray(u)))
        cdf = np.cumsum(pdf, axis=-1)
        want = np.asarray(
            ops.prob_sample(jnp.asarray(cdf), jnp.asarray(u * cdf[:, -1:]))
        )
        np.testing.assert_array_equal(got, want)
        assert got.min() >= 0 and got.max() < 10


class TestFPSPallas:
    """The Pallas FPS kernel (interpret mode on CPU) matches the lax
    implementation and the golden CUDA semantics."""

    def test_matches_lax_and_golden(self, rng):
        from scanobjectnn_tpu.ops.pallas.fps_kernel import fps_pallas
        from scanobjectnn_tpu.ops.fps import farthest_point_sample_lax

        xyz = _cloud(rng, b=4, n=256)
        got = np.asarray(fps_pallas(jnp.asarray(xyz), 64, interpret=True))
        want_lax = np.asarray(farthest_point_sample_lax(jnp.asarray(xyz), 64))
        want_gold = golden.fps_golden(xyz, 64)
        np.testing.assert_array_equal(got, want_lax)
        np.testing.assert_array_equal(got, want_gold)

    def test_small_npoint(self, rng):
        from scanobjectnn_tpu.ops.pallas.fps_kernel import fps_pallas

        xyz = _cloud(rng, b=2, n=32)
        got = np.asarray(fps_pallas(jnp.asarray(xyz), 1, interpret=True))
        assert got.shape == (2, 1) and (got == 0).all()

    @pytest.mark.parametrize("npoint", [1, 7, 64])
    def test_with_coords_matches_gather(self, rng, npoint):
        """fps_pallas_with_coords must return the SAME indices as the plain
        kernel and coordinates bit-identical to gather_point(xyz, idx) —
        the in-kernel lane-select extraction replaces the row gather in the
        eval chain (odd/1 npoint exercise the non-unrolled loop forms)."""
        from scanobjectnn_tpu.ops.fps import gather_point
        from scanobjectnn_tpu.ops.pallas.fps_kernel import (
            fps_pallas,
            fps_pallas_with_coords,
        )

        xyz = jnp.asarray(_cloud(rng, b=3, n=128))
        idx, new_xyz = fps_pallas_with_coords(xyz, npoint, interpret=True)
        want_idx = fps_pallas(xyz, npoint, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
        np.testing.assert_array_equal(
            np.asarray(new_xyz), np.asarray(gather_point(xyz, idx))
        )

    def test_ops_dispatcher_with_coords_lax_fallback(self, rng):
        """The ops-level wrapper's lax fallback (non-TPU) returns the same
        (idx, coords) contract as the kernel path."""
        from scanobjectnn_tpu import ops

        xyz = jnp.asarray(_cloud(rng, b=2, n=96))
        idx, new_xyz = ops.farthest_point_sample_with_coords(xyz, 24)
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(ops.farthest_point_sample(xyz, 24))
        )
        np.testing.assert_array_equal(
            np.asarray(new_xyz), np.asarray(ops.gather_point(xyz, idx))
        )


class TestBallQueryPallas:
    """The Pallas ball-query kernel (interpret mode on CPU) matches the lax
    formulation and the golden CUDA semantics."""

    @pytest.mark.parametrize("radius,nsample", [(0.3, 8), (0.5, 4)])
    def test_matches_golden(self, rng, radius, nsample):
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import query_ball_pallas

        xyz = _cloud(rng, b=3, n=64)
        centers = xyz[:, :16]
        want_idx, want_cnt = golden.query_ball_golden(radius, nsample, xyz, centers)
        got_idx, got_cnt = query_ball_pallas(
            radius, nsample, jnp.asarray(xyz), jnp.asarray(centers), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
        np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)

    def test_empty_ball(self, rng):
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import query_ball_pallas

        xyz = jnp.asarray(_cloud(rng, b=1, n=16))
        far = jnp.full((1, 4, 3), 100.0)
        idx, cnt = query_ball_pallas(0.1, 4, xyz, far, interpret=True)
        assert (np.asarray(cnt) == 0).all()
        assert (np.asarray(idx) == 0).all()

    def test_fused_group_matches(self, rng):
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import query_ball_group_pallas
        from scanobjectnn_tpu import ops

        xyz = _cloud(rng, b=2, n=64)
        centers = xyz[:, :16]
        want_idx, want_cnt = golden.query_ball_golden(0.35, 8, xyz, centers)
        grouped, idx, cnt = query_ball_group_pallas(
            0.35, 8, jnp.asarray(xyz), jnp.asarray(centers), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
        want_grouped = (
            np.asarray(ops.group_point(jnp.asarray(xyz), jnp.asarray(want_idx)))
            - centers[:, :, None, :]
        )
        np.testing.assert_allclose(np.asarray(grouped), want_grouped, atol=1e-6)

    def test_fused_group_matches_large_nsample(self, rng):
        # nsample > 32 exercises the chunked fori_loop slot path (the
        # unrolled branch covers K <= 32).
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import query_ball_group_pallas
        from scanobjectnn_tpu import ops

        xyz = _cloud(rng, b=2, n=96)
        centers = xyz[:, :16]
        want_idx, want_cnt = golden.query_ball_golden(0.8, 48, xyz, centers)
        grouped, idx, cnt = query_ball_group_pallas(
            0.8, 48, jnp.asarray(xyz), jnp.asarray(centers), interpret=True
        )
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
        want_grouped = (
            np.asarray(ops.group_point(jnp.asarray(xyz), jnp.asarray(want_idx)))
            - centers[:, :, None, :]
        )
        np.testing.assert_allclose(np.asarray(grouped), want_grouped, atol=1e-6)

    def test_multi_radius_matches_single(self, rng):
        # The MSG-facing multi-radius op must emit per-radius results
        # IDENTICAL to the single-radius op (a fused shared-distance kernel
        # measured a wash and was removed — the dispatcher contract stays).
        from scanobjectnn_tpu import ops

        xyz = jnp.asarray(_cloud(rng, b=2, n=128))
        centers = xyz[:, :32]
        radii, nsamples = (0.2, 0.4, 0.8), (8, 16, 80)
        multi = ops.query_ball_group_multi(radii, nsamples, xyz, centers)
        for i, (r, ns) in enumerate(zip(radii, nsamples)):
            g1, i1, c1 = ops.query_ball_group(r, ns, xyz, centers)
            g2, i2, c2 = multi[i]
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
            np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
            np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))


class TestKNNPallas:
    def test_matches_lax(self, rng):
        from scanobjectnn_tpu.ops.pallas.knn_kernel import knn_graph_pallas
        from scanobjectnn_tpu.ops.grouping import knn_graph_lax

        feats = jnp.asarray(rng.rand(2, 128, 16).astype(np.float32))
        a = np.asarray(knn_graph_lax(feats, 8))
        b = np.asarray(knn_graph_pallas(feats, 8, interpret=True))
        np.testing.assert_array_equal(a, b)

    def test_self_first(self, rng):
        from scanobjectnn_tpu.ops.pallas.knn_kernel import knn_graph_pallas

        feats = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
        idx = np.asarray(knn_graph_pallas(feats, 4, interpret=True))
        np.testing.assert_array_equal(idx[..., 0], np.arange(64)[None].repeat(2, 0))

    def test_general_knn_matches(self, rng):
        from scanobjectnn_tpu.ops.pallas.knn_kernel import knn_point_pallas
        from scanobjectnn_tpu.ops.grouping import knn_point_lax

        q = jnp.asarray(_cloud(rng, b=2, n=64))
        keys = jnp.asarray(_cloud(rng, b=2, n=96))
        d1, i1 = knn_point_lax(5, keys, q)
        d2, i2 = knn_point_pallas(q, keys, 5, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_duplicate_mask_matches(self, rng):
        from scanobjectnn_tpu.ops.pallas.knn_kernel import duplicate_mask_pallas
        from scanobjectnn_tpu.nn.xconv import _duplicate_mask

        pts = _cloud(rng, b=2, n=128)
        pts[0, 40:50] = pts[0, 10:20]  # exact duplicates of earlier points
        pts[1, 100] = pts[1, 0]
        ptsj = jnp.asarray(pts)
        want = np.asarray(_duplicate_mask(ptsj)).astype(np.float32)
        got = np.asarray(duplicate_mask_pallas(ptsj, interpret=True))
        np.testing.assert_array_equal(want, got)

    def test_duplicate_mask_multi_tile(self, rng):
        # n=384 -> tile=128, g=3: exercises cross-tile global row indexing,
        # the dynamic sublane store, and the revisited output block (the
        # single-tile case covers none of those).
        from scanobjectnn_tpu.ops.pallas.knn_kernel import duplicate_mask_pallas
        from scanobjectnn_tpu.nn.xconv import _duplicate_mask

        pts = _cloud(rng, b=2, n=384)
        pts[0, 300:310] = pts[0, 20:30]   # dup pair spanning tiles 0 and 2
        pts[1, 130] = pts[1, 129]          # adjacent dup inside tile 1
        pts[1, 5] = pts[1, 260]            # "dup" whose twin comes LATER
        ptsj = jnp.asarray(pts)
        want = np.asarray(_duplicate_mask(ptsj)).astype(np.float32)
        got = np.asarray(duplicate_mask_pallas(ptsj, interpret=True))
        np.testing.assert_array_equal(want, got)

    def test_gather_neighbors_grad_close_to_exact_scatter(self, rng):
        # sample_and_group & XConv now route feature gathers through
        # gather_neighbors_pallas, whose VJP is the 2-term bf16 split
        # scatter (~17 mantissa bits) rather than group_point's exact
        # scatter-add; pin the forward exactly and the gradient to the
        # documented precision so a split regression is visible.
        from scanobjectnn_tpu.ops.pallas import edge_kernel
        from scanobjectnn_tpu.ops.grouping import batched_index_gather

        vals = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 64, size=(2, 24, 4)).astype(np.int32))
        a = np.asarray(edge_kernel.gather_neighbors_pallas(vals, idx))
        b = np.asarray(batched_index_gather(vals, idx))
        np.testing.assert_array_equal(a, b)  # forward: 3-term split exact

        def loss_pallas(v):
            return jnp.sum(edge_kernel.gather_neighbors_pallas(v, idx) ** 2)

        def loss_exact(v):
            return jnp.sum(batched_index_gather(v, idx) ** 2)

        ga = np.asarray(jax.grad(loss_pallas)(vals))
        gb = np.asarray(jax.grad(loss_exact)(vals))
        scale = np.abs(gb).max()
        assert np.abs(ga - gb).max() <= 2e-4 * scale  # ~2^-17 rel (2-term)

    def test_knn_dup_bias_selects_unique(self, rng):
        from scanobjectnn_tpu.ops.pallas.knn_kernel import (
            duplicate_mask_pallas,
            knn_point_pallas,
        )

        pts = _cloud(rng, b=1, n=64)
        pts[0, 33] = pts[0, 3]  # duplicate should lose the top-k
        ptsj = jnp.asarray(pts)
        big = 8.0 * float(jnp.max(jnp.sum(ptsj * ptsj, -1))) + 1.0
        bias = duplicate_mask_pallas(ptsj, interpret=True) * big
        _, idx = knn_point_pallas(ptsj, ptsj, 40, interpret=True, bias=bias)
        flat = np.asarray(idx)[0]
        # 63 unique points: index 33 may only ever appear in the LAST slot
        # of a row (all unique candidates exhausted first).
        assert not (flat[:, :-1] == 33).any()

    def test_knn_indices_pallas_branch_matches_lax(self, rng):
        # Pin the TPU dispatch glue of knn_indices_general (dup-bias
        # construction, norm bound, stop-gradient barriers) in interpret
        # mode: CPU runs never take this branch via the public API.
        from scanobjectnn_tpu.nn.xconv import (
            _knn_indices_pallas,
            _mask_duplicate_points,
        )
        from scanobjectnn_tpu.ops.grouping import pairwise_squared_distance

        pts = _cloud(rng, b=2, n=96)
        pts[0, 60:64] = pts[0, 10:14]  # duplicates to suppress
        q = _cloud(rng, b=2, n=32)
        ptsj, qj = jnp.asarray(pts), jnp.asarray(q)
        d2 = _mask_duplicate_points(pairwise_squared_distance(qj, ptsj), ptsj)
        _, want = jax.lax.top_k(-d2, 6)
        _, got = _knn_indices_pallas(qj, ptsj, 6, unique=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        # The branch must be a gradient barrier on every output.
        g = jax.grad(
            lambda p: jnp.sum(_knn_indices_pallas(qj, p, 6, True, True)[0])
        )(ptsj)
        assert float(jnp.max(jnp.abs(g))) == 0.0
