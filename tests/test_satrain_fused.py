"""Parity tests for the fused TRAINING path of the grouped-MLP + max-pool
SA tail (ops/pallas/satrain_kernel.py + satrain_bwd.py + GroupMLPPool):

  * op forward == the unfused Dense/BatchNorm/relu/max chain (values+stats);
  * op VJP == true autodiff of that chain (all cotangents);
  * the Pallas multi-pass backward (interpret mode on CPU) == the XLA
    recompute backward;
  * GroupMLPPool's param tree matches nn.layers.MLP and its train step
    matches the unfused module chain (values, grads, running stats);
  * SAModule/SAModuleMSG end-to-end: fused-on vs fused-off train steps agree.

Reference semantics: pointnet_util.py:87-154 conv2d+BN+relu+reduce_max in
training mode (batch statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from scanobjectnn_tpu.nn.layers import MLP
from scanobjectnn_tpu.nn.pointnet_modules import GroupMLPPool
from scanobjectnn_tpu.ops.pallas import satrain_kernel
from scanobjectnn_tpu.ops.pallas.satrain_kernel import (
    _fwd_chain,
    grouped_bn_mlp_pool,
)


def _inputs(key, shape=(2, 16, 8, 6), feats=(8, 12, 16), dtype=jnp.float32):
    ks = jax.random.split(key, 2 + 4 * len(feats))
    z1 = jax.random.normal(ks[0], shape[:3] + (feats[0],), dtype)
    gammas, betas, ws, bs = [], [], [], []
    prev = feats[0]
    for i, f in enumerate(feats):
        gammas.append(1.0 + 0.1 * jax.random.normal(ks[2 + 4 * i], (f,)))
        betas.append(0.1 * jax.random.normal(ks[3 + 4 * i], (f,)))
        if i > 0:
            ws.append(jax.random.normal(ks[4 + 4 * i], (prev, f)) * 0.3)
            bs.append(0.05 * jax.random.normal(ks[5 + 4 * i], (f,)))
        prev = f
    return z1, tuple(gammas), tuple(betas), tuple(ws), tuple(bs)


def _ref_chain(z1, gammas, betas, ws, bs):
    """The unfused math, differentiable by plain autodiff (no custom VJP)."""
    _, _, _, pooled, means, variances = _fwd_chain(z1, gammas, betas, ws, bs)
    return pooled, tuple(means), tuple(variances)


def _is_dense_bias(pathstr: str) -> bool:
    """Dense biases feeding BatchNorm have analytically-ZERO gradients; both
    the fused and unfused paths return pure f32 cancellation noise there
    (measured up to ~0.05 at 32k rows), so parity comparisons exempt them
    (a generous absolute bound still catches catastrophic breakage)."""
    return "dense" in pathstr and "bias" in pathstr


class TestOpParity:
    def test_forward_matches_chain(self):
        args = _inputs(jax.random.PRNGKey(0))
        got = grouped_bn_mlp_pool(*args)
        want = _ref_chain(*args)
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("k", [8, 16])
    def test_vjp_matches_autodiff(self, k):
        args = _inputs(jax.random.PRNGKey(1), shape=(2, 16, k, 6))
        cot_key = jax.random.PRNGKey(2)

        def loss_op(*a):
            pooled, _, _ = grouped_bn_mlp_pool(*a)
            return jnp.sum(pooled * jax.random.normal(cot_key, pooled.shape))

        def loss_ref(*a):
            pooled, _, _ = _ref_chain(*a)
            return jnp.sum(pooled * jax.random.normal(cot_key, pooled.shape))

        g_op = jax.grad(loss_op, argnums=(0, 1, 2, 3, 4))(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(jax.tree.leaves(g_op[:4]), jax.tree.leaves(g_ref[:4])):
            np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-5)
        for a, b in zip(g_op[4], g_ref[4]):  # Dense biases: noise-only leaves
            np.testing.assert_allclose(a, b, atol=2e-3)

    def test_pallas_bwd_matches_xla_bwd(self, monkeypatch):
        """Interpret-mode Pallas passes == the XLA recompute backward."""
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z1: True)
        args = _inputs(jax.random.PRNGKey(3), shape=(2, 16, 16, 6))
        d_pooled = jax.random.normal(
            jax.random.PRNGKey(4), (2, 16, 12 + 4)
        )  # feats[-1] = 16

        def run():
            def loss(*a):
                pooled, _, _ = grouped_bn_mlp_pool(*a)
                return jnp.sum(pooled * d_pooled)

            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

        g_pallas = run()
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z1: False)
        g_xla = run()
        for a, b in zip(jax.tree.leaves(g_pallas[:4]), jax.tree.leaves(g_xla[:4])):
            np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-5)
        for a, b in zip(g_pallas[4], g_xla[4]):  # noise-only (see _is_dense_bias)
            np.testing.assert_allclose(a, b, atol=2e-3)

    @pytest.mark.parametrize("feats", [(8,), (8, 16), (8, 8, 12, 16)])
    def test_pallas_bwd_merged_passes_all_layer_counts(
        self, feats, monkeypatch
    ):
        """The merged-pass scheduler (round 5: two layers of scalars per
        pass via cross-moment expansion, ceil(L/2)+1 passes) must match the
        XLA recompute backward at every layer count — odd L exercises the
        single-layer tail pass, L=2 the moments-into-final-dW path."""
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z1: True)
        args = _inputs(jax.random.PRNGKey(7), shape=(2, 16, 8, 6), feats=feats)
        d_pooled = jax.random.normal(jax.random.PRNGKey(8), (2, 16, feats[-1]))

        def run():
            def loss(*a):
                pooled, _, _ = grouped_bn_mlp_pool(*a)
                return jnp.sum(pooled * d_pooled)

            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)

        g_pallas = run()
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z1: False)
        g_xla = run()
        for a, b in zip(jax.tree.leaves(g_pallas[:4]), jax.tree.leaves(g_xla[:4])):
            np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-5)
        for a, b in zip(g_pallas[4], g_xla[4]):  # noise-only (see _is_dense_bias)
            np.testing.assert_allclose(a, b, atol=2e-3)

    def test_pallas_bwd_duplicate_rows_tie_split(self, monkeypatch):
        """Ball-padded duplicate neighbor rows tie bit-exactly; the pooled
        gradient must split evenly across them in both backends."""
        z1, gammas, betas, ws, bs = _inputs(
            jax.random.PRNGKey(5), shape=(1, 8, 8, 6)
        )
        z1 = z1.at[:, :, 4:, :].set(z1[:, :, :4, :])  # duplicate slots
        d_pooled = jnp.ones((1, 8, 16))

        def loss(*a):
            pooled, _, _ = grouped_bn_mlp_pool(*a)
            return jnp.sum(pooled * d_pooled)

        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z: True)
        g_p = jax.grad(loss)(z1, gammas, betas, ws, bs)
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z: False)
        g_x = jax.grad(loss)(z1, gammas, betas, ws, bs)
        np.testing.assert_allclose(g_p, g_x, rtol=2e-5, atol=2e-6)
        # even split: the duplicate halves carry identical cotangents
        np.testing.assert_allclose(
            g_x[:, :, 4:, :], g_x[:, :, :4, :], rtol=1e-5, atol=1e-7
        )

    def test_pool_f32_mode(self, monkeypatch):
        """SCANOBJECTNN_SA_POOL_F32 (the round-3 item-8 mixed-precision
        probe): in f32 it is an exact no-op; in bf16 the last layer's tie
        structure goes f32-exact, and the Pallas backward still matches the
        XLA recompute backward under the flag."""
        args32 = _inputs(jax.random.PRNGKey(8), shape=(2, 8, 8, 6))
        base = grouped_bn_mlp_pool(*args32)
        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "1")
        flagged = grouped_bn_mlp_pool(*args32)
        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(flagged)):
            np.testing.assert_array_equal(a, b)  # f32: bit-identical

        z1 = args32[0].astype(jnp.bfloat16)
        rest = args32[1:]
        d_pooled = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 16))

        def loss(*a):
            pooled, _, _ = grouped_bn_mlp_pool(*a)
            return jnp.sum(pooled.astype(jnp.float32) * d_pooled)

        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z: True)
        g_p = jax.grad(loss, argnums=(0, 1, 3))(z1, *rest)
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z: False)
        g_x = jax.grad(loss, argnums=(0, 1, 3))(z1, *rest)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-3,
            )
        # Output dtype stays the compute dtype (bf16 at the boundary).
        pooled, _, _ = grouped_bn_mlp_pool(z1, *rest)
        assert pooled.dtype == jnp.bfloat16

    def test_bf16_paths_agree(self, monkeypatch):
        args = _inputs(jax.random.PRNGKey(6), shape=(2, 8, 8, 6))
        z1 = args[0].astype(jnp.bfloat16)
        rest = args[1:]
        d_pooled = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 16))

        def loss(*a):
            pooled, _, _ = grouped_bn_mlp_pool(*a)
            return jnp.sum(pooled.astype(jnp.float32) * d_pooled)

        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z: True)
        g_p = jax.grad(loss, argnums=(0, 1, 3))(z1, *rest)
        monkeypatch.setattr(satrain_kernel, "_use_pallas_bwd", lambda z: False)
        g_x = jax.grad(loss, argnums=(0, 1, 3))(z1, *rest)
        for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-3,
            )


class TestGroupMLPPool:
    def _mk(self, fused_env, monkeypatch):
        monkeypatch.setenv(
            "SCANOBJECTNN_FUSED_SA_TRAIN", "1" if fused_env else "0"
        )
        feats = (8, 12, 16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 6))
        mdl = GroupMLPPool(feats)
        variables = mdl.init(jax.random.PRNGKey(1), x, train=True)
        return mdl, variables, x

    def test_param_tree_matches_mlp(self, monkeypatch):
        mdl, variables, x = self._mk(True, monkeypatch)
        ref = MLP((8, 12, 16)).init(
            jax.random.PRNGKey(1), x, train=True
        )
        assert jax.tree.structure(variables) == jax.tree.structure(ref)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(ref)):
            assert a.shape == b.shape

    def test_train_step_matches_unfused(self, monkeypatch):
        mdl, variables, x = self._mk(True, monkeypatch)

        def run(v, xx):
            return mdl.apply(
                v, xx, train=True, bn_momentum=0.8, mutable=["batch_stats"]
            )

        pooled_f, stats_f = run(variables, x)

        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "0")
        pooled_u, stats_u = run(variables, x)
        np.testing.assert_allclose(pooled_f, pooled_u, rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(stats_f), jax.tree.leaves(stats_u)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_pool_f32_unfused_matches_fused(self, monkeypatch):
        """The DEFAULT (unfused, XLA-AD) module path implements pool_f32
        too — full bf16 speed with the exact-pool tail — and must match the
        fused op's semantics under the flag (and be a no-op in f32)."""
        feats = (8, 12, 16)
        x32 = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 8, 6))
        mdl32 = GroupMLPPool(feats)
        v32 = mdl32.init(jax.random.PRNGKey(1), x32, train=True)

        def run(mdl, v, xx):
            return mdl.apply(
                v, xx, train=True, bn_momentum=0.8, mutable=["batch_stats"]
            )

        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "0")
        base, _ = run(mdl32, v32, x32)
        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "1")
        flagged, _ = run(mdl32, v32, x32)
        np.testing.assert_array_equal(base, flagged)  # f32: exact no-op

        mdl16 = GroupMLPPool(feats, dtype=jnp.bfloat16)
        x16 = x32.astype(jnp.bfloat16)
        v16 = mdl16.init(jax.random.PRNGKey(1), x16, train=True)
        pooled_u, stats_u = run(mdl16, v16, x16)
        assert pooled_u.dtype == jnp.bfloat16
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "1")
        pooled_f, stats_f = run(mdl16, v16, x16)
        np.testing.assert_allclose(
            np.asarray(pooled_u, np.float32), np.asarray(pooled_f, np.float32),
            rtol=1e-5, atol=1e-6,
        )
        for a, b in zip(jax.tree.leaves(stats_u), jax.tree.leaves(stats_f)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_grads_match_unfused(self, monkeypatch):
        mdl, variables, x = self._mk(True, monkeypatch)
        cot = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16))

        def loss(params, xx):
            out, _ = mdl.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * cot)

        g_f = jax.grad(loss)(variables["params"], x)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "0")
        g_u = jax.grad(loss)(variables["params"], x)
        flat_f = jax.tree.leaves_with_path(g_f)
        flat_u = dict(jax.tree.leaves_with_path(g_u))
        assert len(flat_f) == len(flat_u)
        for path, leaf in flat_f:
            ps = jax.tree_util.keystr(path)
            if _is_dense_bias(ps):
                np.testing.assert_allclose(
                    leaf, flat_u[path], atol=0.2, err_msg=ps
                )
                continue
            np.testing.assert_allclose(
                leaf, flat_u[path], rtol=5e-4, atol=5e-5, err_msg=ps,
            )
        # gradients actually reach every layer (nothing silently dropped)
        for path, leaf in flat_f:
            if _is_dense_bias(jax.tree_util.keystr(path)):
                continue  # Dense bias feeding BN: analytically ~0
            assert np.abs(np.asarray(leaf)).max() > 0, jax.tree_util.keystr(path)


class TestModelIntegration:
    @pytest.mark.parametrize("name", ["pointnet2_cls_ssg", "pointnet2_cls_msg"])
    def test_train_step_fused_matches_unfused(self, name, monkeypatch):
        from scanobjectnn_tpu import models as zoo

        model, loss_fn, _ = zoo.get_model(name, num_classes=4)
        key = jax.random.PRNGKey(0)
        pts = jax.random.normal(key, (2, 512, 3))
        labels = jnp.array([0, 2])
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "0")
        variables = model.init({"params": key, "dropout": key}, pts, train=True)

        def loss(params, batch_stats):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                pts, train=True, bn_momentum=0.8,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            total, _ = model.loss(out, {"labels": labels})
            return total, mut["batch_stats"]

        grad_fn = jax.grad(loss, has_aux=True)

        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "1")
        g_f, bs_f = grad_fn(variables["params"], variables["batch_stats"])
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "0")
        g_u, bs_u = grad_fn(variables["params"], variables["batch_stats"])

        for (pf, lf), (pu, lu) in zip(
            jax.tree.leaves_with_path(g_f), jax.tree.leaves_with_path(g_u)
        ):
            ps = jax.tree_util.keystr(pf)
            assert ps == jax.tree_util.keystr(pu)
            if _is_dense_bias(ps):
                np.testing.assert_allclose(lf, lu, atol=0.2, err_msg=ps)
                continue
            # Model-level tolerance: the BN backward's (du − S1/R − ẑ·S2/R)
            # cancellation at R = 32k rows amplifies f32 summation-order
            # noise ~sqrt(R) over the op-level test shapes (measured: 2e-5
            # at 512 rows → ~3e-4 here; the unfused-vs-unfused permutation
            # probe bounds module-level noise at 2e-5 · mag).
            np.testing.assert_allclose(
                lf, lu, rtol=2e-2, atol=1e-3, err_msg=ps
            )
        for a, b in zip(jax.tree.leaves(bs_f), jax.tree.leaves(bs_u)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
