"""Fused EdgeConv parity: the Pallas kNN+reduce kernel and the A+B/pair-BN
reformulation must match the direct reference dataflow (edge tensor →
Dense → BN → relu → max) in values AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanobjectnn_tpu.ops.pallas.edge_kernel import (
    edge_reduce_lax,
    edge_reduce_pallas,
)


def _data(rng, b=2, n=64, c=16):
    return jnp.asarray(rng.randn(b, n, c).astype(np.float32))


class TestEdgeReduceKernel:
    def test_forward_matches_lax(self, rng):
        feats = _data(rng)
        vals = _data(rng)
        got = edge_reduce_pallas(feats, vals, 8)
        want = edge_reduce_lax(feats, vals, 8)
        np.testing.assert_array_equal(np.asarray(got["idx"]), np.asarray(want["idx"]))
        for key in ("mmax", "mmin", "s", "q2", "cntmax", "cntmin"):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key]), rtol=1e-5, atol=1e-5,
                err_msg=key,
            )

    def test_vjp_matches_lax(self, rng):
        feats = _data(rng)
        vals = _data(rng)
        w = jnp.asarray(rng.randn(4).astype(np.float32))

        def loss(fn, v):
            r = fn(feats, v, 8)
            return (
                w[0] * jnp.sum(jnp.sin(r["mmax"]))
                + w[1] * jnp.sum(jnp.cos(r["mmin"]))
                + w[2] * jnp.sum(r["s"] * r["s"])
                + w[3] * jnp.sum(r["q2"])
            )

        g_pallas = jax.grad(lambda v: loss(edge_reduce_pallas, v))(vals)
        g_lax = jax.grad(lambda v: loss(edge_reduce_lax, v))(vals)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_lax), rtol=1e-4, atol=1e-5
        )

    def test_vjp_numeric(self, rng):
        """Central-difference check through the custom VJP."""
        feats = _data(rng, b=1, n=32, c=8)
        vals = _data(rng, b=1, n=32, c=8)

        def f(v):
            r = edge_reduce_pallas(feats, v, 4)
            return jnp.sum(r["mmax"]) + 0.5 * jnp.sum(r["q2"]) + jnp.sum(r["s"])

        g = np.asarray(jax.grad(f)(vals))
        eps = 1e-3
        rs = np.random.RandomState(3)
        for _ in range(5):
            i = rs.randint(vals.size)
            d = np.zeros(vals.size, np.float32)
            d[i] = eps
            d = d.reshape(vals.shape)
            num = (float(f(vals + d)) - float(f(vals - d))) / (2 * eps)
            np.testing.assert_allclose(g.flatten()[i], num, rtol=2e-2, atol=2e-3)


class TestFusedEdgeConv:
    def _modules(self, features=24, k=8):
        from scanobjectnn_tpu.models.dgcnn import EdgeConv

        return (
            EdgeConv(features=features, k=k, fused=True),
            EdgeConv(features=features, k=k, fused=False),
        )

    def test_same_param_tree_and_forward(self, rng):
        fused, plain = self._modules()
        x = _data(rng, b=2, n=64, c=16)
        vf = fused.init(jax.random.PRNGKey(0), x, False, 0.9)
        vp = plain.init(jax.random.PRNGKey(0), x, False, 0.9)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)

        # Same variables drive both: train forward + BN stat updates match.
        for train in (False, True):
            yf, mf = fused.apply(vf, x, train, 0.9, mutable=["batch_stats"])
            yp, mp = plain.apply(vf, x, train, 0.9, mutable=["batch_stats"])
            np.testing.assert_allclose(
                np.asarray(yf), np.asarray(yp), rtol=1e-4, atol=1e-5
            )
            for a, b in zip(
                jax.tree_util.tree_leaves(mf), jax.tree_util.tree_leaves(mp)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
                )

    def test_negative_gamma_uses_min(self, rng):
        """bn∘relu is DEcreasing for γ<0: the fused path must select the
        neighbor MIN there to equal the reference's post-activation max."""
        fused, plain = self._modules()
        x = _data(rng, b=2, n=64, c=16)
        v = fused.init(jax.random.PRNGKey(0), x, False, 0.9)
        v = jax.tree_util.tree_map(lambda p: p, v)
        # Flip half the gamma signs.
        scale = v["params"]["mlp"]["bn_0"]["scale"]
        new_scale = scale.at[::2].set(-scale[::2] - 0.3)
        v = jax.tree_util.tree_map(lambda p: p, v)
        v["params"]["mlp"]["bn_0"]["scale"] = new_scale  # type: ignore

        yf, _ = fused.apply(v, x, True, 0.9, mutable=["batch_stats"])
        yp, _ = plain.apply(v, x, True, 0.9, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), rtol=1e-4, atol=1e-5)

    def test_gradients_match(self, rng):
        fused, plain = self._modules()
        x = _data(rng, b=2, n=64, c=16)
        v = fused.init(jax.random.PRNGKey(0), x, False, 0.9)

        def loss(mod, params, x):
            y, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, 0.9, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.tanh(y))

        gf_p, gf_x = jax.grad(lambda p, xx: loss(fused, p, xx), argnums=(0, 1))(
            v["params"], x
        )
        gp_p, gp_x = jax.grad(lambda p, xx: loss(plain, p, xx), argnums=(0, 1))(
            v["params"], x
        )
        np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gp_x), rtol=1e-3, atol=1e-5)
        flat_f = jax.tree_util.tree_leaves_with_path(gf_p)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(gp_p))
        for path, leaf in flat_f:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_p[path]), rtol=1e-3, atol=1e-5,
                err_msg=str(path),
            )

    @pytest.mark.slow
    def test_dgcnn_model_runs_fused(self, rng):
        """The full DGCNN forward+loss+grad runs with fused EdgeConvs."""
        from scanobjectnn_tpu.models.dgcnn import DGCNN

        model = DGCNN(num_classes=5, k=8)
        pts = _data(rng, b=2, n=64, c=3)
        v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                       pts, train=False)

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                pts, train=True, bn_momentum=0.9,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            l, _ = DGCNN.loss(out, {"labels": jnp.zeros(2, jnp.int32)})
            return l

        l, g = jax.value_and_grad(loss)(v["params"])
        assert np.isfinite(float(l))
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


class TestFusedTnet:
    def test_tnet_fused_matches_plain(self, rng):
        from scanobjectnn_tpu.models.dgcnn import EdgeTransformNet

        pts = _data(rng, b=2, n=64, c=3)
        fused = EdgeTransformNet(k=8, fused=True)
        plain = EdgeTransformNet(k=8, fused=False)
        vf = fused.init(jax.random.PRNGKey(0), pts, False, 0.9)
        vp = plain.init(jax.random.PRNGKey(0), pts, False, 0.9)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)

        for train in (False, True):
            yf, mf = fused.apply(vf, pts, train, 0.9, mutable=["batch_stats"])
            yp, mp = plain.apply(vf, pts, train, 0.9, mutable=["batch_stats"])
            np.testing.assert_allclose(
                np.asarray(yf), np.asarray(yp), rtol=1e-4, atol=1e-5
            )
            # A+B association admits fp cancellation on near-identical
            # neighbors: stats agree to absolute ~1e-5 (values O(1e-2..1)).
            for a, b in zip(
                jax.tree_util.tree_leaves(mf), jax.tree_util.tree_leaves(mp)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5
                )

    def test_gather_neighbors_pallas_matches_and_grads(self, rng):
        from scanobjectnn_tpu.ops.grouping import batched_index_gather
        from scanobjectnn_tpu.ops.pallas.edge_kernel import gather_neighbors_pallas

        vals = _data(rng, b=2, n=64, c=16)
        idx = jnp.asarray(
            np.random.RandomState(1).randint(0, 64, (2, 32, 5)), jnp.int32
        )
        got = gather_neighbors_pallas(vals, idx)
        want = batched_index_gather(vals, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

        def f(fn, v):
            return jnp.sum(jnp.sin(fn(v, idx) if fn is not batched_index_gather else fn(v, idx)))

        gp = jax.grad(lambda v: jnp.sum(jnp.sin(gather_neighbors_pallas(v, idx))))(vals)
        gl = jax.grad(lambda v: jnp.sum(jnp.sin(batched_index_gather(v, idx))))(vals)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gl), rtol=1e-5, atol=1e-6)


class TestFusedSpiderConv:
    def test_spiderconv_fused_matches_plain(self, rng):
        from scanobjectnn_tpu import ops
        from scanobjectnn_tpu.models.spidercnn import SpiderConv

        b, n, k, c = 2, 64, 8, 16
        feat = _data(rng, b=b, n=n, c=c)
        pts = _data(rng, b=b, n=n, c=3)
        idx = ops.knn_graph(pts, k)
        delta = ops.group_point(pts, idx) - pts[:, :, None, :]

        fused = SpiderConv(features_out=32, fused=True)
        plain = SpiderConv(features_out=32, fused=False)
        vf = fused.init(jax.random.PRNGKey(0), feat, idx, delta)
        vp = plain.init(jax.random.PRNGKey(0), feat, idx, delta)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vp)

        yf = fused.apply(vf, feat, idx, delta)
        yp = plain.apply(vf, feat, idx, delta)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), rtol=1e-4, atol=1e-5)

        # Gradients too (params + input features).
        def loss(mod, params, f):
            return jnp.sum(jnp.tanh(mod.apply(params, f, idx, delta)))

        gf = jax.grad(lambda p, f: loss(fused, p, f), argnums=(0, 1))(vf, feat)
        gp = jax.grad(lambda p, f: loss(plain, p, f), argnums=(0, 1))(vf, feat)
        for a, b_ in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5
            )

    def test_spidercnn_model_fused_matches_plain(self, rng):
        from scanobjectnn_tpu.models.spidercnn import SpiderCNNCls

        pts = _data(rng, b=2, n=64, c=3)
        fused = SpiderCNNCls(num_classes=5, nsample=8, fused=True)
        plain = SpiderCNNCls(num_classes=5, nsample=8, fused=False)
        keys = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        vf = fused.init(keys, pts, train=False)
        yf = fused.apply(vf, pts, train=False)["logits"]
        yp = plain.apply(vf, pts, train=False)["logits"]
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), rtol=1e-4, atol=1e-5)


class TestEdgeGatherKnn:
    def test_matches_knn_plus_gather(self, rng):
        from scanobjectnn_tpu.ops.grouping import batched_index_gather, knn_graph_lax
        from scanobjectnn_tpu.ops.pallas.edge_kernel import edge_gather_knn

        feats = _data(rng, b=2, n=64, c=3)
        vals = _data(rng, b=2, n=64, c=16)
        got, idx = edge_gather_knn(feats, vals, 8)
        want_idx = knn_graph_lax(feats, 8)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
        want = batched_index_gather(vals, want_idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

        gp = jax.grad(lambda v: jnp.sum(jnp.sin(edge_gather_knn(feats, v, 8)[0])))(vals)
        gl = jax.grad(lambda v: jnp.sum(jnp.sin(batched_index_gather(v, want_idx))))(vals)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gl), rtol=1e-5, atol=1e-6)


class TestSpiderConvKernel:
    """The fully-fused spiderConv kernel (ops/pallas/spider_kernel.py) vs the
    XLA oracle, in interpret mode.  The kernel computes at bf16 operand
    precision (as XLA's Dense does on TPU) while the oracle runs f32 on CPU,
    so comparisons are at bf16 tolerance relative to the output scale."""

    def _close(self, got, want, tol=2.5e-2):
        got, want = np.asarray(got), np.asarray(want)
        scale = float(np.max(np.abs(want))) + 1e-9
        np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=tol)

    @pytest.mark.parametrize("shape", [(2, 256, 6, 3, 32), (1, 512, 20, 16, 64)])
    def test_kernel_matches_lax(self, rng, shape):
        from scanobjectnn_tpu.ops.pallas.spider_kernel import (
            spider_conv_lax,
            spider_conv_pallas,
        )

        b, n, k, c, o = shape
        t = 5
        key = jax.random.PRNGKey(0)
        feat = _data(rng, b=b, n=n, c=c)
        idx = jnp.asarray(np.random.RandomState(1).randint(0, n, (b, n, k)), jnp.int32)
        g = jax.random.normal(jax.random.fold_in(key, 2), (b, n, k, t), jnp.float32)
        kern = jax.random.normal(jax.random.fold_in(key, 3), (k * c * t, o)) * 0.05

        self._close(spider_conv_pallas(feat, idx, g, kern),
                    spider_conv_lax(feat, idx, g, kern))

        gp = jax.grad(
            lambda f, g_, k_: jnp.sum(spider_conv_pallas(f, idx, g_, k_) ** 2),
            argnums=(0, 1, 2),
        )(feat, g, kern)
        gl = jax.grad(
            lambda f, g_, k_: jnp.sum(spider_conv_lax(f, idx, g_, k_) ** 2),
            argnums=(0, 1, 2),
        )(feat, g, kern)
        for a, b_ in zip(gp, gl):
            self._close(a, b_)

    def test_module_pallas_path_matches_plain(self, rng, monkeypatch):
        """Force the Pallas dispatch (interpret mode off-TPU) through the
        SpiderConv module and compare against the unfused oracle with the
        SAME param tree."""
        import scanobjectnn_tpu.ops.fps as fps_mod
        from scanobjectnn_tpu import ops
        from scanobjectnn_tpu.models.spidercnn import SpiderConv

        b, n, k, c = 2, 256, 8, 16
        feat = _data(rng, b=b, n=n, c=c)
        pts = _data(rng, b=b, n=n, c=3)
        idx = ops.knn_graph(pts, k)
        delta = ops.group_point(pts, idx) - pts[:, :, None, :]

        fused = SpiderConv(features_out=32, fused=True)
        plain = SpiderConv(features_out=32, fused=False)
        vf = fused.init(jax.random.PRNGKey(0), feat, idx, delta)

        monkeypatch.setenv("SCANOBJECTNN_OPS_BACKEND", "pallas")
        yf = fused.apply(vf, feat, idx, delta)
        monkeypatch.setenv("SCANOBJECTNN_OPS_BACKEND", "lax")
        yp = plain.apply(vf, feat, idx, delta)
        got, want = np.asarray(yf), np.asarray(yp)
        scale = float(np.max(np.abs(want))) + 1e-9
        np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2.5e-2)
