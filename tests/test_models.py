"""Model-level shape/loss/grad smoke tests, mirroring the reference's
__main__ graph-build checks (SURVEY.md §4.2) but stronger: forward shapes,
finite losses, nonzero grads, train/eval mode divergence, BN stat updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanobjectnn_tpu import models as zoo

B, N = 4, 128


def _batch(kind, num_classes=15, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    batch = {
        "points": jnp.asarray(rng.randn(B, N, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, num_classes, B).astype(np.int32)),
    }
    if kind == "seg":
        batch["masks"] = jnp.asarray(rng.randint(0, 2, (B, N)).astype(np.int32))
    if kind == "partseg":
        batch["parts"] = jnp.asarray(rng.randint(0, 6, (B, N)).astype(np.int32))
    return batch


def _init(model):
    key = jax.random.PRNGKey(0)
    return model.init({"params": key, "dropout": key}, jnp.zeros((B, N, 3)), train=False)


ALL_MODELS = sorted(zoo.MODEL_REGISTRY)


@pytest.mark.parametrize("name", ALL_MODELS)
@pytest.mark.slow
def test_forward_shapes_and_loss(name):
    spec = zoo.MODEL_REGISTRY[name]
    model, loss_fn, kind = zoo.get_model(name)
    variables = _init(model)
    batch = _batch(kind)
    outputs = model.apply(variables, batch["points"], train=False)
    if kind == "cls":
        assert outputs["logits"].shape == (B, 15)
    if kind == "seg":
        assert outputs["logits"].shape == (B, 15)
        assert outputs["seg_logits"].shape == (B, N, 2)
    if kind == "partseg":
        assert outputs["seg_logits"].shape == (B, N, 6)
    loss, metrics = loss_fn(outputs, batch)
    assert np.isfinite(float(loss))
    assert "loss" in metrics


@pytest.mark.parametrize("name", ["pointnet_cls", "pointnet2_cls_ssg", "dgcnn"])
@pytest.mark.slow
def test_grads_nonzero(name):
    model, loss_fn, kind = zoo.get_model(name)
    variables = _init(model)
    batch = _batch(kind)
    key = jax.random.PRNGKey(1)

    def f(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["points"], train=True, bn_momentum=0.9,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return loss_fn(out, batch)[0]

    grads = jax.grad(f)(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert max(norms) > 0
    assert all(np.isfinite(n) for n in norms)


def test_bn_stats_update():
    model, _, _ = zoo.get_model("pointnet_cls_basic")
    variables = _init(model)
    batch = _batch("cls")
    _, mutated = model.apply(
        variables, batch["points"] * 5.0, train=True, bn_momentum=0.5,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(float(jnp.abs(a - b).max()) > 1e-6 for a, b in zip(after, before))
    assert changed


def test_eval_deterministic_train_stochastic():
    model, _, _ = zoo.get_model("pointnet_cls")
    variables = _init(model)
    batch = _batch("cls")
    o1 = model.apply(variables, batch["points"], train=False)
    o2 = model.apply(variables, batch["points"], train=False)
    np.testing.assert_allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]))
    t1, _ = model.apply(
        variables, batch["points"], train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )
    t2, _ = model.apply(
        variables, batch["points"], train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert np.abs(np.asarray(t1["logits"]) - np.asarray(t2["logits"])).max() > 0


@pytest.mark.slow
def test_msg_scale_remat_parity():
    """SAModuleMSG.remat_scales is a pure scheduling change: loss, gradients,
    and BN-stat updates match the default path with the SAME parameters
    (the remat boundary saves only scale inputs + pooled outputs)."""
    from scanobjectnn_tpu.models.pointnet2 import PointNet2ClsMSG

    base = PointNet2ClsMSG()
    rem = PointNet2ClsMSG(remat_scales=True)
    variables = _init(base)
    batch = _batch("cls")

    def run(model):
        def loss(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["points"], train=True, bn_momentum=0.9,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return model.loss(out, batch)[0], mut
        (l, mut), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"]
        )
        return l, mut, g

    l0, m0, g0 = run(base)
    l1, m1, g1 = run(rem)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        (m0, g0), (m1, g1),
    )


def test_tnet_identity_at_init():
    """T-Nets start as the identity transform (zero weights + identity bias,
    transform_nets.py:40-53)."""
    model = zoo.TransformNet(k=3)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 3).astype(np.float32))
    variables = model.init(key, x, False, 0.9)
    t = model.apply(variables, x, False, 0.9)
    np.testing.assert_allclose(
        np.asarray(t), np.tile(np.eye(3), (2, 1, 1)), atol=1e-5
    )


def test_pointnet_loss_includes_orthogonality():
    model, loss_fn, _ = zoo.get_model("pointnet_cls")
    variables = _init(model)
    batch = _batch("cls")
    outputs = model.apply(variables, batch["points"], train=False)
    # Perturb the transform away from orthogonality; loss must increase.
    _, metrics = loss_fn(outputs, batch)
    outputs_bad = dict(outputs)
    outputs_bad["end_points"] = {
        "transform": outputs["end_points"]["transform"] * 3.0
    }
    _, metrics_bad = loss_fn(outputs_bad, batch)
    assert float(metrics_bad["mat_diff_loss"]) > float(metrics["mat_diff_loss"])


def test_bga_loss_weighting():
    model, loss_fn, _ = zoo.get_model("pointnet2_cls_bga")
    variables = _init(model)
    batch = _batch("seg")
    outputs = model.apply(variables, batch["points"], train=False)
    t0, m0 = loss_fn(outputs, batch, seg_weight=0.0)
    t1, m1 = loss_fn(outputs, batch, seg_weight=1.0)
    np.testing.assert_allclose(float(t0), float(m0["classify_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(t1), float(m1["seg_loss"]), rtol=1e-5)


class TestLiftedGroupMLP:
    """The lifted-first-Dense MSG path must equal the gather-then-MLP
    formulation with the SAME parameters (exact linear refactoring), for
    both the with-features and xyz-only cases."""

    def _check(self, with_feats):
        import numpy as np

        from scanobjectnn_tpu import ops
        from scanobjectnn_tpu.nn.layers import MLP
        from scanobjectnn_tpu.nn.pointnet_modules import LiftedGroupMLP
        from scanobjectnn_tpu.ops.pallas.edge_kernel import gather_neighbors

        rng = np.random.RandomState(0)
        xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        new_xyz = xyz[:, :16]
        feats = (
            jnp.asarray(rng.randn(2, 64, 11).astype(np.float32))
            if with_feats else None
        )
        grouped_xyz, idx, _ = ops.query_ball_group(0.8, 8, xyz, new_xyz)

        mod = LiftedGroupMLP((10, 12), xyz_first=False)
        key = jax.random.PRNGKey(0)
        variables = mod.init(key, feats, xyz, new_xyz, idx, train=False)

        got = mod.apply(variables, feats, xyz, new_xyz, idx, train=False)

        # Old-style: gather, concat, MLP — same params work because the
        # trees match (dense_i / bn_i).
        if with_feats:
            grouped = jnp.concatenate(
                [gather_neighbors(feats, idx), grouped_xyz], axis=-1
            )
        else:
            grouped = grouped_xyz
        want = MLP((10, 12)).apply(variables, grouped, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_with_features(self):
        self._check(True)

    def test_xyz_only(self):
        self._check(False)

    def test_bf16_offset_keeps_centered_precision(self):
        """dtype=bfloat16 with a large common coordinate offset: the lifted
        form multiplies UNCENTERED coords, so without Dense.highest_cols
        (exact xyz products, f32 output, rounding only after the p·W − q·W
        cancellation) the error re-quantizes at the |p·W| scale — measured
        ~0.25 abs here; the fixed path stays at the grouped form's own bf16
        noise (~0.016)."""
        import numpy as np

        from scanobjectnn_tpu import ops
        from scanobjectnn_tpu.nn.layers import MLP
        from scanobjectnn_tpu.nn.pointnet_modules import LiftedGroupMLP
        from scanobjectnn_tpu.ops.pallas.edge_kernel import gather_neighbors

        rng = np.random.RandomState(0)
        xyz = jnp.asarray(64.0 + 0.5 * rng.randn(2, 64, 3).astype(np.float32))
        new_xyz = xyz[:, :16]
        feats = jnp.asarray(rng.randn(2, 64, 11).astype(np.float32))
        grouped_xyz, idx, _ = ops.query_ball_group(0.8, 8, xyz, new_xyz)

        mod = LiftedGroupMLP((10, 12), xyz_first=False, dtype=jnp.bfloat16)
        variables = mod.init(
            jax.random.PRNGKey(0), feats, xyz, new_xyz, idx, train=False
        )
        got = jax.jit(
            lambda v: mod.apply(v, feats, xyz, new_xyz, idx, train=False)
        )(variables)

        grouped = jnp.concatenate(
            [gather_neighbors(feats, idx), grouped_xyz], axis=-1
        )
        want = MLP((10, 12), dtype=jnp.bfloat16).apply(
            variables, grouped, train=False
        )
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
        assert err.max() < 0.05, f"lifted bf16 drifted from grouped: {err.max()}"
