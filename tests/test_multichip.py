"""Multi-chip data parallelism over the simulated 8-device CPU mesh:
sharded train steps must be numerically consistent with single-device
execution, and the batch must actually land sharded.  Net-new vs the
reference (its multi-device story is vacuous, SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanobjectnn_tpu.data import synthetic
from scanobjectnn_tpu.parallel import mesh as mesh_lib
from scanobjectnn_tpu.train import Trainer, TrainerConfig


def _data(num_classes=3, n=48):
    pts, labels = synthetic.make_synthetic_dataset(
        num_per_class=8, num_classes=num_classes, num_points=n
    )
    return {"points": pts, "labels": labels}


def test_mesh_has_8_devices():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_batch_lands_sharded():
    mesh = mesh_lib.make_mesh()
    batch = {"points": np.zeros((16, 32, 3), np.float32)}
    sharded = mesh_lib.shard_batch(batch, mesh)
    s = sharded["points"].sharding
    assert s.is_fully_replicated is False
    # 16 rows over 8 devices -> 2 rows per shard
    shard_shapes = {tuple(d.data.shape) for d in sharded["points"].addressable_shards}
    assert shard_shapes == {(2, 32, 3)}


def test_sharded_step_matches_single_device():
    """The same train step on an 8-device mesh and on a single-device mesh
    must produce (nearly) identical parameters — GSPMD's psum-of-grads is
    just a reduction reorder."""
    # SGD+momentum: the update is linear in the gradient, so cross-device
    # reduction-order noise stays at float-epsilon scale.  (Adam's rsqrt(v)
    # amplifies ~1e-7 gradient noise into O(lr) parameter differences within
    # a few steps — numerically expected, not a sharding bug.)
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=32, batch_size=16,
        augment_rotate=False, augment_jitter=False, optimizer="momentum",
    )
    data = _data(n=32)
    batch = {k: v[:16] for k, v in data.items()}
    rng = jax.random.PRNGKey(0)

    mesh8 = mesh_lib.make_mesh()
    mesh1 = mesh_lib.make_mesh(devices=jax.devices()[:1])

    t8 = Trainer(cfg, mesh=mesh8)
    t1 = Trainer(cfg, mesh=mesh1)
    s8 = t8.init_state(0)
    s1 = t1.init_state(0)

    # Identical initialization.
    for a, b in zip(
        jax.tree_util.tree_leaves(s8.params), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    for _ in range(3):
        s8, m8 = t8.train_step(s8, batch, rng)
        s1, m1 = t1.train_step(s1, batch, rng)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s8.params), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


# One representative per family (all six reference method families) plus a
# partseg head — each must run its FULL train step sharded over the mesh
# (the dryrun_multichip contract).
FAMILY_MODELS = [
    "pointnet_cls",        # pointnet family (T-Nets)
    "pointnet2_cls_ssg",   # pointnet2 family (SA pyramid)
    "dgcnn_bga",           # dgcnn family, seg kind
    "spidercnn_cls_xyz",   # spidercnn family
    "3dmfv_net_cls",       # 3dmfv family (FV + 3D Inception)
    "pointcnn_cls",        # pointcnn family (XConv)
    "pointnet_partseg",    # partseg kind
]


@pytest.mark.parametrize("name", FAMILY_MODELS)
@pytest.mark.slow
def test_full_train_step_per_family_on_mesh(name):
    from scanobjectnn_tpu import models as zoo

    n = 128
    data = _data(n=n)
    mesh = mesh_lib.make_mesh()
    rng = jax.random.PRNGKey(0)
    kind = zoo.MODEL_REGISTRY[name].kind
    cfg = TrainerConfig(
        model=name,
        num_classes=3 if kind != "partseg" else 6,
        num_point=n,
        batch_size=8,
    )
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state(0)
    batch = {"points": data["points"][:8], "labels": data["labels"][:8]}
    if kind == "seg":
        batch["masks"] = np.random.RandomState(0).randint(0, 2, (8, n))
    if kind == "partseg":
        batch["parts"] = np.random.RandomState(0).randint(0, 6, (8, n))
    state, metrics = trainer.train_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"])), name


def test_device_resident_epoch_is_sharded_and_matches_single_device():
    """The device-resident whole-epoch-in-one-jit path must (a) run its train
    steps batch-sharded over the mesh (with_sharding_constraint inside
    _epoch_impl) and (b) match single-device numerics — GSPMD's gradient
    psum is just a reduction reorder under SGD."""
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=32, batch_size=16,
        augment_rotate=False, augment_jitter=False, optimizer="momentum",
    )
    data = _data(n=32)
    rng = jax.random.PRNGKey(0)

    t8 = Trainer(cfg, mesh=mesh_lib.make_mesh())
    t1 = Trainer(cfg, mesh=mesh_lib.make_mesh(devices=jax.devices()[:1]))
    s8 = t8.init_state(0)
    s1 = t1.init_state(0)
    d8 = t8.upload_dataset(data)
    d1 = t1.upload_dataset(data)

    # The epoch program must constrain each sliced batch to the data-axis
    # sharding: assert the ACTUAL spec in the lowered program — the points
    # batch [16, 32, 3] carries [{"data"}, {}, {}] (batch dim split over the
    # mesh axis), the labels [16] carry [{"data"}] — not just any mention of
    # the word "sharding".
    import re

    lowered = jax.jit(t8._epoch_impl).lower(s8, d8, rng)
    hlo = lowered.as_text()
    assert re.search(
        r'sharding_constraint[^\n]*\[\{"data"\}, \{\}, \{\}\]>'
        r" : tensor<16x32x3xf32>",
        hlo,
    ), "points batch not constrained to the data axis in the epoch program"
    assert re.search(
        r'sharding_constraint[^\n]*\[\{"data"\}\]> : tensor<16xi32>', hlo
    ), "labels not constrained to the data axis in the epoch program"

    for _ in range(2):
        s8, sum8 = t8.train_epoch_device(s8, d8, rng)
        s1, sum1 = t1.train_epoch_device(s1, d1, rng)

    np.testing.assert_allclose(sum8["mean_loss"], sum1["mean_loss"], rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s8.params), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_device_resident_eval_is_sharded_and_matches_single_device():
    """The device-resident eval program (Trainer.evaluate_device) must (a)
    constrain its per-batch slices to the data axis like the train epoch
    and (b) produce identical results on 8 devices and 1 device — eval has
    no gradient psum, so the tallies must match exactly."""
    import re

    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=8
    )
    data = _data(n=48)
    n = 19  # padded remainder batch included
    sub = {"points": data["points"][:n], "labels": data["labels"][:n]}

    t8 = Trainer(cfg, mesh=mesh_lib.make_mesh())
    t1 = Trainer(cfg, mesh=mesh_lib.make_mesh(devices=jax.devices()[:1]))
    s8 = t8.init_state(0)
    s1 = t1.init_state(0)
    d8 = t8.upload_dataset(sub)
    d1 = t1.upload_dataset(sub)

    rots = jax.device_put(t8._vote_rotations(2), t8._repl)
    hlo = jax.jit(t8._eval_epoch_impl).lower(s8, d8, rots, None).as_text()
    assert re.search(
        r'sharding_constraint[^\n]*\[\{"data"\}, \{\}, \{\}\]>'
        r" : tensor<8x48x3xf32>",
        hlo,
    ), "eval batch slices not constrained to the data axis"

    ev8 = t8.evaluate_device(s8, d8, num_votes=2, shuffle=False)
    ev1 = t1.evaluate_device(s1, d1, num_votes=2, shuffle=False)
    np.testing.assert_array_equal(ev8["predictions"], ev1["predictions"])
    assert ev8["accuracy"] == ev1["accuracy"]
    np.testing.assert_allclose(ev8["mean_loss"], ev1["mean_loss"], rtol=1e-5)


def test_cross_replica_batchnorm_matches_global_stats():
    """BatchNorm(axis_name='data') under shard_map over a batch-sharded input
    must equal single-device BatchNorm over the full batch — the psum'd batch
    statistics ARE the global-batch statistics (the TPU-native replacement
    for dgcnn's batch_norm_dist_template, dgcnn/utils/tf_util.py:502-535)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from scanobjectnn_tpu.nn.layers import BatchNorm

    mesh = mesh_lib.make_mesh()
    x = np.random.RandomState(0).randn(16, 8).astype(np.float32) * 3.0 + 1.5

    bn_ref = BatchNorm()
    variables = bn_ref.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    y_ref, mut_ref = bn_ref.apply(
        variables, jnp.asarray(x), False, 0.9, mutable=["batch_stats"]
    )

    bn_x = BatchNorm(axis_name="data")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P("data"), P(), P()),
    )
    def sharded_bn(xs):
        y, mut = bn_x.apply(variables, xs, False, 0.9, mutable=["batch_stats"])
        stats = mut["batch_stats"]
        return y, stats["mean"], stats["var"]

    y, mean, var = sharded_bn(jnp.asarray(x))
    mut_stats = mut_ref["batch_stats"]
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mut_stats["mean"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(mut_stats["var"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
