"""Tests for exact-key pooling (ops/exactpool.py) and the pool_f32 "keys"
mode of the shared-MLP final layer (nn.layers.mlp_final_max):

  * the op reduces to jnp.max (values + even-tie-split VJP) when key == y;
  * spurious bf16 ties are broken by the f32 key (the mode's entire point);
  * mode "keys" is value- and gradient-identical to mode "0" in f32;
  * MLP(final_max_axis=...) keeps the MLP parameter tree and matches the
    external-pool formulation in mode "0".

Reference context: net-new mixed-precision mode (the reference trains f32
only); the f32 training semantics being preserved are pointnet_util.py's
conv+BN+relu+reduce_max stacks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scanobjectnn_tpu.nn.layers import MLP
from scanobjectnn_tpu.nn.pointnet_modules import GroupMLPPool
from scanobjectnn_tpu.ops.exactpool import exact_key_max_pool


class TestOp:
    def test_matches_jnp_max_when_key_is_y(self):
        y = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16))
        y = y.at[:, 3, :].set(y[:, 5, :])  # exact ties
        cot = jax.random.normal(jax.random.PRNGKey(1), (4, 16))

        def a(yy):
            return jnp.sum(exact_key_max_pool(yy, yy, 1) * cot)

        def b(yy):
            return jnp.sum(jnp.max(yy, axis=1) * cot)

        np.testing.assert_array_equal(
            exact_key_max_pool(y, y, 1), jnp.max(y, axis=1)
        )
        np.testing.assert_allclose(
            jax.grad(a)(y), jax.grad(b)(y), rtol=1e-6, atol=1e-7
        )

    def test_spurious_bf16_tie_broken_by_key(self):
        # Two rows that round to the SAME bf16 value but differ in f32:
        # plain bf16 max splits the credit; exact keys give it to the true
        # winner alone.
        key = jnp.array([[[1.0], [1.0 + 1e-4], [0.5]]], jnp.float32)
        y = key.astype(jnp.bfloat16)
        assert y[0, 0, 0] == y[0, 1, 0]  # the spurious tie exists

        g_plain = jax.grad(
            lambda v: jnp.sum(jnp.max(v, axis=1).astype(jnp.float32))
        )(y)
        g_keys = jax.grad(
            lambda v: jnp.sum(
                exact_key_max_pool(v, key, 1).astype(jnp.float32)
            )
        )(y)
        np.testing.assert_allclose(
            np.asarray(g_plain, np.float32)[0, :, 0], [0.5, 0.5, 0.0]
        )
        np.testing.assert_allclose(
            np.asarray(g_keys, np.float32)[0, :, 0], [0.0, 1.0, 0.0]
        )

    def test_no_gradient_to_key(self):
        y = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8))
        key = y.astype(jnp.float32) * 2.0
        g = jax.grad(
            lambda k: jnp.sum(exact_key_max_pool(y, k, 1))
        )(key)
        np.testing.assert_array_equal(g, jnp.zeros_like(key))


class TestKeysMode:
    def _run(self, mdl, v, x):
        return mdl.apply(
            v, x, train=True, bn_momentum=0.8, mutable=["batch_stats"]
        )

    def test_f32_noop_values_and_grads(self, monkeypatch):
        feats = (8, 12, 16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 6))
        mdl = GroupMLPPool(feats)
        v = mdl.init(jax.random.PRNGKey(1), x, train=True)
        cot = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16))

        def loss(params, xx):
            out, _ = mdl.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * cot)

        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "0")
        base, _ = self._run(mdl, v, x)
        g0 = jax.grad(loss)(v["params"], x)
        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "keys")
        flagged, _ = self._run(mdl, v, x)
        gk = jax.grad(loss)(v["params"], x)
        np.testing.assert_array_equal(base, flagged)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(gk)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_bf16_param_tree_and_dtype(self, monkeypatch):
        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "keys")
        feats = (8, 12, 16)
        x = jax.random.normal(
            jax.random.PRNGKey(0), (2, 16, 8, 6)
        ).astype(jnp.bfloat16)
        mdl = GroupMLPPool(feats, dtype=jnp.bfloat16)
        v = mdl.init(jax.random.PRNGKey(1), x, train=True)
        ref = MLP(feats).init(
            jax.random.PRNGKey(1),
            jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 6)),
            train=True,
        )
        assert jax.tree.structure(v) == jax.tree.structure(ref)
        out, _ = self._run(mdl, v, x)
        assert out.dtype == jnp.bfloat16
        # grads flow to every layer
        def loss(params):
            o, _ = mdl.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(o.astype(jnp.float32))

        g = jax.grad(loss)(v["params"])
        for path, leaf in jax.tree.leaves_with_path(g):
            ps = jax.tree_util.keystr(path)
            if "dense" in ps and "bias" in ps:
                continue  # analytically ~0 feeding BN
            assert np.abs(np.asarray(leaf, np.float32)).max() > 0, ps


class TestMLPFinalMax:
    def test_matches_external_pool_mode0(self, monkeypatch):
        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "0")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 6))
        pooled_mdl = MLP((8, 16), final_max_axis=1)
        v = pooled_mdl.init(jax.random.PRNGKey(1), x, train=True)
        ref_mdl = MLP((8, 16))
        vr = ref_mdl.init(jax.random.PRNGKey(1), x, train=True)
        assert jax.tree.structure(v) == jax.tree.structure(vr)
        a, _ = pooled_mdl.apply(
            v, x, train=True, bn_momentum=0.8, mutable=["batch_stats"]
        )
        b, _ = ref_mdl.apply(
            vr, x, train=True, bn_momentum=0.8, mutable=["batch_stats"]
        )
        np.testing.assert_array_equal(a, jnp.max(b, axis=1))


class TestFusedDenseBnExactkeyPool:
    """round-5: the fused final layer (dense_bn_exactkey_pool) vs the
    module chain it replaces in bf16 keys mode."""

    def _module_chain(self, x, w, b, gamma, beta, axis):
        """The unfused keys-mode math (mlp_final_max's module branch),
        reproduced functionally so both paths see identical params."""
        cd = jnp.bfloat16
        z32 = jnp.einsum(
            "...i,io->...o", x.astype(cd), w.astype(cd),
            preferred_element_type=jnp.float32,
        ) + b
        zb = z32.astype(cd)
        zbf = zb.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(zbf, axis=axes)
        var = jnp.maximum(
            jnp.mean(jnp.square(zbf), axis=axes) - jnp.square(mean), 0.0
        )
        r = jax.lax.rsqrt(var + 1e-3)
        y = jnp.maximum((((zbf - mean) * r) * gamma + beta).astype(cd), 0)
        sg = jax.lax.stop_gradient
        key = jnp.maximum(
            (sg(z32) - sg(mean)) * jax.lax.rsqrt(sg(var) + 1e-3) * sg(gamma)
            + sg(beta),
            0.0,
        )
        return exact_key_max_pool(y, key, axis)

    def _args(self):
        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        x = jax.random.normal(ks[0], (2, 16, 8, 6), jnp.bfloat16)
        w = jax.random.normal(ks[1], (6, 16), jnp.float32) * 0.4
        b = jax.random.normal(ks[2], (16,), jnp.float32) * 0.1
        gamma = 1.0 + 0.2 * jax.random.normal(ks[3], (16,), jnp.float32)
        beta = 0.1 * jax.random.normal(ks[4], (16,), jnp.float32)
        return x, w, b, gamma, beta

    def test_forward_bit_equal_and_stats(self):
        from scanobjectnn_tpu.ops.exactpool import dense_bn_exactkey_pool

        x, w, b, gamma, beta = self._args()
        pooled, mean, var = dense_bn_exactkey_pool(x, w, b, gamma, beta, 2)
        ref = self._module_chain(x, w, b, gamma, beta, 2)
        assert pooled.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(pooled, np.float32), np.asarray(ref, np.float32)
        )
        # stats are the BN batch statistics of the ROUNDED z
        zb = (jnp.einsum(
            "...i,io->...o", x, w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) + b).astype(jnp.bfloat16).astype(jnp.float32)
        np.testing.assert_allclose(
            mean, jnp.mean(zb, axis=(0, 1, 2)), rtol=1e-6, atol=1e-7
        )

    def test_gradients_close_to_module_chain(self):
        """Gradients match the module chain's up to the documented bf16
        cotangent rounding before the dx/dW matmuls."""
        from scanobjectnn_tpu.ops.exactpool import dense_bn_exactkey_pool

        x, w, b, gamma, beta = self._args()
        cot = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16))

        def lf(args):
            p, _, _ = dense_bn_exactkey_pool(*args, 2)
            return jnp.sum(p.astype(jnp.float32) * cot)

        def lr(args):
            return jnp.sum(
                self._module_chain(*args, 2).astype(jnp.float32) * cot
            )

        gf = jax.grad(lf)((x, w, b, gamma, beta))
        gr = jax.grad(lr)((x, w, b, gamma, beta))
        names = ("x", "w", "b", "gamma", "beta")
        for name, a, c in zip(names, gf, gr):
            if name == "b":
                # Through train-mode BN the output is invariant to a
                # constant pre-BN shift, so db ~= 0 analytically.  The
                # fused backward computes that (f32 sums cancel); the
                # module chain's autodiff rounds the cotangent to bf16
                # inside the z32->bf16->f32 convert pair, so ITS db is
                # bf16 rounding noise (~1e-2) — don't compare to noise,
                # assert the fused one is the near-zero analytic value.
                assert np.max(np.abs(np.asarray(a, np.float32))) < 1e-4
                continue
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                rtol=2e-2, atol=2e-2, err_msg=f"grad mismatch for {name}",
            )

    def test_poolkey_kernel_bit_parity(self, monkeypatch):
        """round-5: the Pallas fused forward (poolkey_kernel) must be
        BIT-equal to the XLA chain — outputs AND gradients — since its
        dispatch is a pure-speed choice."""
        from scanobjectnn_tpu.ops.exactpool import dense_bn_exactkey_pool

        # lane-aligned channel width (the kernel's eligibility) — the tiny
        # fixture shapes above stay on the XLA chain by design.
        ks = jax.random.split(jax.random.PRNGKey(11), 5)
        x = jax.random.normal(ks[0], (2, 4, 8, 6), jnp.bfloat16)
        w = jax.random.normal(ks[1], (6, 128), jnp.float32) * 0.4
        b = jax.random.normal(ks[2], (128,), jnp.float32) * 0.1
        gamma = 1.0 + 0.2 * jax.random.normal(ks[3], (128,), jnp.float32)
        beta = 0.1 * jax.random.normal(ks[4], (128,), jnp.float32)
        cot = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 128))

        def run(args):
            def lf(a):
                p, m, v = dense_bn_exactkey_pool(*a, 2)
                return (
                    jnp.sum(p.astype(jnp.float32) * cot)
                    + jnp.sum(m) * 0.1 + jnp.sum(v) * 0.1
                )

            (p, m, v) = dense_bn_exactkey_pool(*args, 2)
            g = jax.grad(lf)(args)
            return p, m, v, g

        monkeypatch.setenv("SCANOBJECTNN_POOLKEY", "0")
        p0, m0, v0, g0 = run((x, w, b, gamma, beta))
        monkeypatch.setenv("SCANOBJECTNN_POOLKEY", "1")
        monkeypatch.setenv("SCANOBJECTNN_OPS_BACKEND", "pallas")
        from scanobjectnn_tpu.ops import exactpool as ep

        assert ep._poolkey_ok(x.shape[:-1] + (128,), 2, 1e-3)
        p1, m1, v1, g1 = run((x, w, b, gamma, beta))
        np.testing.assert_array_equal(
            np.asarray(p0, np.float32), np.asarray(p1, np.float32)
        )
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        for a, c in zip(g0, g1):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(c, np.float32)
            )

    def test_poolkey_eligibility(self):
        from scanobjectnn_tpu.ops.pallas.poolkey_kernel import (
            poolkey_eligible,
        )

        assert poolkey_eligible((16, 512, 32, 128), 2)   # SA1
        assert poolkey_eligible((16, 128, 64, 256), 2)   # SA2
        assert poolkey_eligible((16, 1, 128, 1024), 2)   # SA3 group_all
        assert not poolkey_eligible((16, 512, 32, 64), 2)   # C < 128 (MSG s1)
        assert not poolkey_eligible((16, 512, 32, 128), 1)  # wrong axis
        # global-pool heads: K*C rows exceed the block budget — XLA chain
        assert not poolkey_eligible((24, 1024, 1024), 1)

    def test_groupmlppool_dispatches_fused(self, monkeypatch):
        """bf16 keys mode must route the final layer through the fused op."""
        from scanobjectnn_tpu.ops import exactpool as ep

        calls = []
        real = ep.dense_bn_exactkey_pool

        def spy(*a, **k):
            calls.append(a[0].dtype)
            return real(*a, **k)

        monkeypatch.setattr(ep, "dense_bn_exactkey_pool", spy)
        monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "keys")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 6))
        mdl = GroupMLPPool((8, 12, 16), dtype=jnp.bfloat16)
        v = mdl.init(jax.random.PRNGKey(1), x, train=False)
        out, _ = mdl.apply(v, x, train=True, mutable=["batch_stats"])
        assert calls == [jnp.bfloat16]
        assert out.dtype == jnp.bfloat16
