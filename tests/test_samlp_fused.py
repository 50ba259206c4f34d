"""Fused eval-time SA layer parity: the Pallas gather+folded-BN-MLP+max-pool
kernel (ops/pallas/samlp_kernel.py) must reproduce the unfused
gather → MLP → max dataflow (ref pointnet_util.py:87-154) in eval mode.

Runs the kernel in interpret mode (CPU); the module dispatch is driven
through the SCANOBJECTNN_FUSED_SA_EVAL env override so the exact production
code path (SAModule.__call__ fused branch) is what's tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanobjectnn_tpu.nn.pointnet_modules import SAModule


def _cloud(rng, b=2, n=256, c=0):
    xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.5)
    pts = (
        jnp.asarray(rng.randn(b, n, c).astype(np.float32)) if c else None
    )
    return xyz, pts


def _run_both(monkeypatch, module, xyz, points, seed=0):
    """Init once, then eval-apply unfused and fused-interpret."""
    variables = module.init(
        jax.random.PRNGKey(seed), xyz, points, train=False
    )
    monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "0")
    ref = module.apply(variables, xyz, points, train=False)
    monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "interpret")
    got = module.apply(variables, xyz, points, train=False)
    return ref, got


def _trained_stats(variables, rng):
    """Replace the init-default BN running stats (mean 0 / var 1 make the
    fold a no-op on the mean term) with random ones so the fold is actually
    exercised."""
    stats = jax.tree.map(
        lambda v: jnp.asarray(
            0.5 + 0.3 * np.abs(rng.randn(*v.shape)), jnp.float32
        ),
        variables["batch_stats"],
    )
    return {**variables, "batch_stats": stats}


class TestFusedSAEval:
    def test_sa1_xyz_only(self, rng, monkeypatch):
        xyz, _ = _cloud(rng, b=2, n=256)
        m = SAModule(npoint=64, radius=0.4, nsample=16, mlp=(16, 16, 32))
        ref, got = _run_both(monkeypatch, m, xyz, None)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_sa2_with_features_and_fold(self, rng, monkeypatch):
        xyz, pts = _cloud(rng, b=2, n=128, c=24)
        m = SAModule(npoint=32, radius=0.6, nsample=8, mlp=(32, 48))
        variables = m.init(jax.random.PRNGKey(1), xyz, pts, train=False)
        variables = _trained_stats(variables, rng)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "0")
        ref = m.apply(variables, xyz, pts, train=False)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "interpret")
        got = m.apply(variables, xyz, pts, train=False)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_no_xyz_concat(self, rng, monkeypatch):
        xyz, pts = _cloud(rng, b=1, n=128, c=16)
        m = SAModule(
            npoint=32, radius=0.6, nsample=8, mlp=(16, 16), use_xyz=False
        )
        ref, got = _run_both(monkeypatch, m, xyz, pts)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_knn_grouping(self, rng, monkeypatch):
        xyz, pts = _cloud(rng, b=1, n=128, c=8)
        m = SAModule(npoint=32, radius=None, nsample=8, mlp=(16, 32), knn=True)
        ref, got = _run_both(monkeypatch, m, xyz, pts)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_mlp2_tail(self, rng, monkeypatch):
        xyz, _ = _cloud(rng, b=1, n=128)
        m = SAModule(
            npoint=32, radius=0.5, nsample=8, mlp=(16, 16), mlp2=(32,)
        )
        ref, got = _run_both(monkeypatch, m, xyz, None)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_no_bn(self, rng, monkeypatch):
        xyz, _ = _cloud(rng, b=1, n=128)
        m = SAModule(npoint=32, radius=0.5, nsample=8, mlp=(16, 16), bn=False)
        ref, got = _run_both(monkeypatch, m, xyz, None)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_bf16_module_parity(self, rng, monkeypatch):
        """dtype=bfloat16 modules (the CLI --dtype bfloat16 eval path) must
        agree between the fused kernel and the unfused dataflow to bf16
        tolerance — the synth-hard bf16 eval runs exactly this dispatch."""
        xyz, pts = _cloud(rng, b=2, n=128, c=24)
        m = SAModule(
            npoint=32, radius=0.6, nsample=8, mlp=(32, 48),
            dtype=jnp.bfloat16,
        )
        variables = m.init(jax.random.PRNGKey(1), xyz, pts, train=False)
        variables = _trained_stats(variables, rng)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "0")
        ref = m.apply(variables, xyz, pts, train=False)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "interpret")
        got = m.apply(variables, xyz, pts, train=False)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
        r = np.asarray(ref[1], np.float32)
        g = np.asarray(got[1], np.float32)
        # bf16 tolerance: the fused kernel folds BN into the weights, so the
        # two paths round in different places; agreement to ~2 bf16 ulps of
        # the activation scale is the contract.
        scale = max(1.0, float(np.abs(r).max()))
        assert np.abs(r - g).max() < 0.035 * scale, (
            f"fused bf16 drifted: {np.abs(r - g).max()} vs scale {scale}"
        )

    def test_train_mode_keeps_unfused(self, rng, monkeypatch):
        """Training must NOT dispatch to the fused kernel (BN batch stats)."""
        xyz, _ = _cloud(rng, b=1, n=128)
        m = SAModule(npoint=32, radius=0.5, nsample=8, mlp=(16, 16))
        variables = m.init(jax.random.PRNGKey(0), xyz, None, train=False)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "interpret")
        out, mut = m.apply(
            variables, xyz, None, train=True, mutable=["batch_stats"]
        )
        # train path updates running stats -> proves the unfused branch ran
        stats = jax.tree.leaves(mut["batch_stats"])
        init_stats = jax.tree.leaves(variables["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(stats, init_stats)
        )


class TestFusedMSGEval:
    """SAModuleMSG's eval-time fused scales (K<=64 -> safused kernel,
    K>64 -> unfused chain) must reproduce the unfused module output —
    including the MSG [feats, xyz] concat order (xyz_first=False) and the
    LiftedGroupMLP-parameterized scales (MLP-compatible tree fold)."""

    def _run_both(self, monkeypatch, module, xyz, points, stats_rng=None):
        variables = module.init(
            jax.random.PRNGKey(0), xyz, points, train=False
        )
        if stats_rng is not None:
            variables = _trained_stats(variables, stats_rng)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "0")
        ref = module.apply(variables, xyz, points, train=False)
        monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "interpret")
        got = module.apply(variables, xyz, points, train=False)
        return ref, got

    def test_msg_l1_no_points_mixed_k(self, rng, monkeypatch):
        from scanobjectnn_tpu.nn.pointnet_modules import SAModuleMSG

        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
        m = SAModuleMSG(
            npoint=64,
            radius_list=(0.2, 0.4, 0.6, 0.8),
            # 8/16 unrolled-fused; 80 chunked-fused (%16); 72 keeps the chain
            nsample_list=(8, 16, 80, 72),
            mlp_list=((8, 16), (8, 16), (8, 16), (8, 16)),
        )
        ref, got = self._run_both(monkeypatch, m, xyz, None, stats_rng=rng)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_msg_l2_with_points_lifted_scale(self, rng, monkeypatch):
        """points wide enough that the training path lifts the first Dense
        (C_in + 3 > mlp[0]) — eval fold must still match."""
        from scanobjectnn_tpu.nn.pointnet_modules import SAModuleMSG

        xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.5)
        pts = jnp.asarray(rng.randn(2, 128, 24).astype(np.float32))
        m = SAModuleMSG(
            npoint=32,
            radius_list=(0.3, 0.6),
            nsample_list=(8, 16),
            mlp_list=((8, 16), (8, 16)),  # 24+3 > 8 -> lifted in training
        )
        ref, got = self._run_both(monkeypatch, m, xyz, pts, stats_rng=rng)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )

    def test_msg_use_xyz_false(self, rng, monkeypatch):
        from scanobjectnn_tpu.nn.pointnet_modules import SAModuleMSG

        xyz = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 0.5)
        pts = jnp.asarray(rng.randn(1, 128, 8).astype(np.float32))
        m = SAModuleMSG(
            npoint=32,
            radius_list=(0.4,),
            nsample_list=(8,),
            mlp_list=((16, 16),),
            use_xyz=False,
        )
        ref, got = self._run_both(monkeypatch, m, xyz, pts, stats_rng=rng)
        np.testing.assert_allclose(
            np.asarray(ref[1]), np.asarray(got[1]), rtol=2e-4, atol=2e-5
        )


class TestFullyFusedBallMLP:
    """The fully-fused ball-select+gather+MLP+pool kernel
    (ops/pallas/safused_kernel.py) must be BIT-exact vs the two-kernel
    chain (query_ball_group_pallas -> sa_mlp_pool) it replaces — same
    selection math, same matmul order, no HBM round trip in between."""

    @staticmethod
    def _weights(rng, shapes):
        ws = [
            jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
            for s in shapes
        ]
        bs = [
            jnp.asarray(rng.randn(s[1]).astype(np.float32) * 0.1)
            for s in shapes
        ]
        return ws, bs

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_coords_only_matches_chain(self, rng, dtype):
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import (
            query_ball_group_pallas,
        )
        from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
        from scanobjectnn_tpu.ops.pallas.samlp_kernel import sa_mlp_pool

        xyz = jnp.asarray(rng.randn(3, 256, 3).astype(np.float32) * 0.5)
        q = xyz[:, :64, :]
        ws, bs = self._weights(rng, [(3, 8), (8, 16)])
        grouped, idx, _ = query_ball_group_pallas(0.4, 16, xyz, q, True)
        want = sa_mlp_pool(grouped, None, None, ws, bs, dtype=dtype,
                           interpret=True)
        got, gidx = sa_ball_mlp_pool(0.4, 16, xyz, q, None, ws, bs,
                                     dtype=dtype, interpret=True)
        np.testing.assert_array_equal(np.asarray(gidx), np.asarray(idx))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("use_xyz", [True, False])
    def test_with_features_matches_chain(self, rng, use_xyz):
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import (
            query_ball_group_pallas,
        )
        from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
        from scanobjectnn_tpu.ops.pallas.samlp_kernel import sa_mlp_pool

        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
        q = xyz[:, :64, :]
        src = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
        c_in = (3 + 8) if use_xyz else 8
        ws, bs = self._weights(rng, [(c_in, 8), (8, 16)])
        grouped, idx, _ = query_ball_group_pallas(0.4, 16, xyz, q, True)
        want = sa_mlp_pool(grouped if use_xyz else None, idx, src, ws, bs,
                           dtype=jnp.float32, interpret=True)
        got, gidx = sa_ball_mlp_pool(0.4, 16, xyz, q, src, ws, bs,
                                     use_xyz=use_xyz, dtype=jnp.float32,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(gidx), np.asarray(idx))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("nsample", [80, 128])
    def test_chunked_large_k_matches_chain(self, rng, nsample):
        """K > 64 runs the fori_loop-chunked slot path (16-slot unrolled
        chunks, traced base) and returns idx=None; the pooled output must
        stay bit-exact vs the two-kernel chain."""
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import (
            query_ball_group_pallas,
        )
        from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
        from scanobjectnn_tpu.ops.pallas.samlp_kernel import sa_mlp_pool

        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
        q = xyz[:, :32, :]
        src = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
        ws, bs = self._weights(rng, [(3 + 8, 8), (8, 16)])
        grouped, idx, _ = query_ball_group_pallas(0.6, nsample, xyz, q, True)
        want = sa_mlp_pool(grouped, idx, src, ws, bs, dtype=jnp.float32,
                           interpret=True)
        got, gidx = sa_ball_mlp_pool(0.6, nsample, xyz, q, src, ws, bs,
                                     dtype=jnp.float32, interpret=True)
        assert gidx is None
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize(
        "nsample,dtype",
        [(16, jnp.float32), (16, jnp.bfloat16), (80, jnp.float32)],
    )
    def test_stacked_extraction_bit_matches_per_slot(
        self, rng, monkeypatch, nsample, dtype
    ):
        """SCANOBJECTNN_SA_STACKED=1 swaps the per-slot [T, N] one-hot
        matmuls for one [kc*T, N] stacked matmul per chunk.  Every row's
        contraction is unchanged, so pooled output AND idx must be
        BIT-identical to the per-slot path (K > 64 exercises the traced
        chunk base; bf16 the packed-split reconstruction)."""
        from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool

        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
        q = xyz[:, :64, :]
        src = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
        ws, bs = self._weights(rng, [(3 + 8, 8), (8, 16)])

        monkeypatch.setenv("SCANOBJECTNN_SA_STACKED", "0")
        want, widx = sa_ball_mlp_pool(0.5, nsample, xyz, q, src, ws, bs,
                                      dtype=dtype, interpret=True)
        monkeypatch.setenv("SCANOBJECTNN_SA_STACKED", "1")
        got, gidx = sa_ball_mlp_pool(0.5, nsample, xyz, q, src, ws, bs,
                                     dtype=dtype, interpret=True)
        if nsample <= 64:
            np.testing.assert_array_equal(np.asarray(gidx), np.asarray(widx))
        else:
            assert gidx is None and widx is None
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("xyz_first", [True, False])
    def test_prelifted_wide_features(self, rng, xyz_first):
        """C > feats[0] triggers the per-point Dense-0 lift (gather moves
        feats[0] channels, not C).  Same values as the chain up to f32
        summation regrouping (the LiftedGroupMLP identity), NOT bit-exact."""
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import (
            query_ball_group_pallas,
        )
        from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
        from scanobjectnn_tpu.ops.pallas.samlp_kernel import sa_mlp_pool

        xyz = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
        q = xyz[:, :64, :]
        src = jnp.asarray(rng.randn(2, 256, 24).astype(np.float32))
        c_in = 24 + 3
        w0 = rng.randn(c_in, 8).astype(np.float32) * 0.2
        if not xyz_first:
            w0 = np.concatenate([w0[3:], w0[:3]], axis=0)  # [feats, xyz]
        ws = [jnp.asarray(w0), jnp.asarray(rng.randn(8, 16).astype(np.float32) * 0.2)]
        bs = [jnp.asarray(rng.randn(c).astype(np.float32) * 0.1) for c in (8, 16)]

        # chain oracle in the SSG [xyz, feats] order
        ws_ssg = [jnp.asarray(np.concatenate([w0[-3:], w0[:-3]], axis=0))
                  if not xyz_first else ws[0], ws[1]]
        grouped, idx, _ = query_ball_group_pallas(0.4, 16, xyz, q, True)
        want = sa_mlp_pool(grouped, idx, src, ws_ssg, bs, dtype=jnp.float32,
                           interpret=True)
        got, _ = sa_ball_mlp_pool(0.4, 16, xyz, q, src, ws, bs,
                                  xyz_first=xyz_first, dtype=jnp.float32,
                                  interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_empty_rows_pad_like_reference(self, rng):
        """Queries with zero in-radius points pad with point 0 (centered),
        idx 0 — the reference CUDA semantics (tf_grouping_g.cu:3-36) that
        the lax path and ball-group kernel already pin."""
        from scanobjectnn_tpu.ops.pallas.ballquery_kernel import (
            query_ball_group_pallas,
        )
        from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
        from scanobjectnn_tpu.ops.pallas.samlp_kernel import sa_mlp_pool

        xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 2.0)
        # far-away queries: every row empty
        q = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32) + 50.0)
        ws, bs = self._weights(rng, [(3, 8), (8, 8)])
        grouped, idx, _ = query_ball_group_pallas(0.1, 8, xyz, q, True)
        assert (np.asarray(idx) == 0).all()
        want = sa_mlp_pool(grouped, None, None, ws, bs, dtype=jnp.float32,
                           interpret=True)
        got, gidx = sa_ball_mlp_pool(0.1, 8, xyz, q, None, ws, bs,
                                     dtype=jnp.float32, interpret=True)
        np.testing.assert_array_equal(np.asarray(gidx), np.asarray(idx))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_pack_traced_exact_under_jit():
    """bf16_pack_traced must keep the residual terms live under jit: the
    astype-based split (_bf16_pack) is folded to identity by XLA's
    --xla_allow_excess_precision rule at trace level, which silently zeroes
    every term after the first (bf16-level 7.6e-3 error).  The traced pack
    rounds via lax.reduce_precision, which the folder cannot see through;
    the 3-term sum must reconstruct f32 inputs to ~f32 ulp."""
    from scanobjectnn_tpu.ops.pallas.onehot import _SPLIT_TERMS, bf16_pack_traced

    rng = np.random.RandomState(0)
    v = jnp.asarray((rng.randn(64, 24) * 10.0).astype(np.float32))

    packed = jax.jit(bf16_pack_traced)(v)
    c = v.shape[-1]
    assert packed.shape[-1] == _SPLIT_TERMS * c
    terms = [
        np.asarray(packed[..., i * c : (i + 1) * c], np.float32)
        for i in range(_SPLIT_TERMS)
    ]
    # residual terms must be live (the regression: folded -> all-zero tails)
    assert all(np.any(t != 0.0) for t in terms[1:])
    recon = np.sum(terms, axis=0)
    np.testing.assert_allclose(recon, np.asarray(v), rtol=3e-7, atol=1e-6)
