"""End-to-end training on tiny synthetic data: loss decreases and accuracy
beats chance within a few epochs; checkpoint save/restore round-trips.
The reference has no such test (SURVEY.md §4 item (d) — net-new fixture)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanobjectnn_tpu.data import synthetic
from scanobjectnn_tpu.train import Trainer, TrainerConfig


def _dataset(num_classes=3, n=64, with_mask=False):
    arrays = synthetic.make_synthetic_dataset(
        num_per_class=16, num_classes=num_classes, num_points=n, with_mask=with_mask
    )
    out = {"points": arrays[0], "labels": arrays[1]}
    if with_mask:
        from scanobjectnn_tpu.data import io

        out["masks"] = io.convert_to_binary_mask(arrays[2])
    return out


@pytest.mark.slow
def test_pointnet_learns():
    cfg = TrainerConfig(
        model="pointnet_cls_basic",
        num_classes=3,
        num_point=48,
        batch_size=8,
        max_epoch=1,
        learning_rate=3e-3,
        seed=0,
    )
    trainer = Trainer(cfg)
    data = _dataset()
    state = trainer.init_state(0)
    rng = jax.random.PRNGKey(0)
    sampler_kwargs = dict(num_points=cfg.num_point, seed=0)
    from scanobjectnn_tpu.data.pipeline import EpochSampler

    sampler = EpochSampler(data["points"], data["labels"], **sampler_kwargs)
    losses = []
    for _ in range(8):
        state, summary = trainer.train_epoch(state, sampler, rng)
        losses.append(summary["mean_loss"])
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    ev = trainer.evaluate(state, data["points"], data["labels"], num_votes=1)
    assert ev["accuracy"] > 0.55  # 3 classes, chance = 0.33
    assert 0 <= ev["avg_class_accuracy"] <= 1
    assert len(ev["per_class_accuracy"]) == 3


@pytest.mark.slow
def test_bga_seg_training_step():
    cfg = TrainerConfig(
        model="pointnet_seg",
        num_classes=3,
        num_point=48,
        batch_size=8,
        max_epoch=1,
        seed=0,
    )
    trainer = Trainer(cfg)
    data = _dataset(with_mask=True)
    state = trainer.init_state(0)
    batch = {k: v[:8] for k, v in data.items()}
    state2, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "seg_loss" in metrics and "classify_loss" in metrics
    assert int(state2.step) == 1
    ev = trainer.evaluate(
        state2, data["points"], data["labels"], masks=data["masks"], num_votes=2
    )
    assert "seg_accuracy" in ev and 0 <= ev["seg_accuracy"] <= 1


def test_voting_eval_improves_consistency():
    """Voting with K votes sums logits over K y-rotations; with K=1 it must
    equal a plain eval."""
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset()
    state = trainer.init_state(0)
    e1 = trainer.evaluate(state, data["points"], data["labels"], num_votes=1, seed=7)
    e2 = trainer.evaluate(state, data["points"], data["labels"], num_votes=1, seed=7)
    np.testing.assert_array_equal(e1["predictions"], e2["predictions"])


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainerConfig(
        model="pointnet_cls_basic",
        num_classes=3,
        num_point=48,
        batch_size=8,
        log_dir=str(tmp_path / "log"),
    )
    trainer = Trainer(cfg)
    data = _dataset()
    state = trainer.init_state(0)
    state, _ = trainer.train_step(
        state, {k: v[:8] for k, v in data.items()}, jax.random.PRNGKey(0)
    )
    trainer.save(state)
    template = trainer.init_state(1)
    restored = trainer.restore(template)
    assert restored is not None
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_lr_and_bn_schedules():
    from scanobjectnn_tpu.train import schedules

    lr = schedules.exponential_decay_lr(0.001, 16, decay_step=200_000, decay_rate=0.7)
    assert float(lr(0)) == pytest.approx(0.001)
    assert float(lr(200_000 // 16)) == pytest.approx(0.0007, rel=1e-4)
    assert float(lr(10**9)) == pytest.approx(1e-5)  # clipped floor
    bn = schedules.bn_momentum_schedule(16, decay_step=200_000)
    assert float(bn(0)) == pytest.approx(0.5)
    assert float(bn(200_000 // 16)) == pytest.approx(0.75)
    assert float(bn(10**9)) == pytest.approx(0.99)  # clipped ceiling


@pytest.mark.slow
def test_device_resident_epoch_matches_learning():
    """The whole-epoch-in-one-jit fast path learns like the host path."""
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=8,
        learning_rate=3e-3, device_resident=True,
    )
    trainer = Trainer(cfg)
    data = _dataset()
    device_data = trainer.upload_dataset(data)
    state = trainer.init_state(0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, summary = trainer.train_epoch_device(state, device_data, rng)
        losses.append(summary["mean_loss"])
    assert losses[-1] < losses[0], losses
    ev = trainer.evaluate(state, data["points"], data["labels"], num_votes=1)
    assert ev["accuracy"] > 0.55


@pytest.mark.slow
def test_device_resident_seg_epoch():
    cfg = TrainerConfig(
        model="pointnet_seg", num_classes=3, num_point=48, batch_size=8,
        device_resident=True,
    )
    trainer = Trainer(cfg)
    data = _dataset(with_mask=True)
    device_data = trainer.upload_dataset(data)
    state = trainer.init_state(0)
    state, summary = trainer.train_epoch_device(state, device_data, jax.random.PRNGKey(0))
    assert np.isfinite(summary["mean_loss"])
    assert "seg_accuracy" in summary


def test_synthetic_fifteen_classes():
    from scanobjectnn_tpu.data import synthetic

    pts, labels = synthetic.make_synthetic_dataset(
        num_per_class=2, num_classes=15, num_points=64
    )
    assert pts.shape == (30, 64, 3)
    assert set(labels.tolist()) == set(range(15))
    assert np.isfinite(pts).all()


def test_evaluate_covers_remainder_and_matches_batch1():
    """No test sample is dropped when len(data) % batch_size != 0, and
    accuracies are identical to the reference's BATCH_SIZE=1 protocol
    (evaluate_scenennobjects.py:29)."""
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset()
    n = 19  # 19 % 8 == 3 → padded remainder batch
    pts, lbl = data["points"][:n], data["labels"][:n]
    state = trainer.init_state(0)
    ev8 = trainer.evaluate(state, pts, lbl, num_votes=2, shuffle=False)
    assert ev8["total_seen"] == n
    assert len(ev8["predictions"]) == n

    cfg1 = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=1
    )
    from scanobjectnn_tpu.parallel import mesh as mesh_lib

    trainer1 = Trainer(cfg1, mesh=mesh_lib.make_mesh(devices=jax.devices()[:1]))
    # Same params: re-init with the same seed gives identical weights.
    state1 = trainer1.init_state(0)
    ev1 = trainer1.evaluate(state1, pts, lbl, num_votes=2, shuffle=False)
    assert ev1["total_seen"] == n
    np.testing.assert_array_equal(ev8["predictions"], ev1["predictions"])
    assert ev8["accuracy"] == ev1["accuracy"]
    np.testing.assert_allclose(
        ev8["per_class_accuracy"], ev1["per_class_accuracy"], equal_nan=True
    )


def test_device_eval_matches_host_protocol():
    """evaluate_device (whole voting eval as ONE jitted program) must
    reproduce the host evaluate() exactly when no point subsample is in
    play (num_point == stored points, shuffle=False): same predictions,
    accuracy, per-class table, and mean loss — including the padded
    remainder batch."""
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset()
    n = 19  # 19 % 8 == 3 → padded remainder batch
    pts, lbl = data["points"][:n, :48], data["labels"][:n]
    state = trainer.init_state(0)
    host = trainer.evaluate(state, pts, lbl, num_votes=3, shuffle=False)
    dev = trainer.evaluate_device(
        state, trainer.upload_dataset({"points": pts, "labels": lbl}),
        num_votes=3,
    )
    assert dev["total_seen"] == n
    np.testing.assert_array_equal(dev["predictions"], host["predictions"])
    np.testing.assert_array_equal(dev["labels"], host["labels"])
    assert dev["accuracy"] == host["accuracy"]
    np.testing.assert_allclose(
        dev["per_class_accuracy"], host["per_class_accuracy"], equal_nan=True
    )
    np.testing.assert_allclose(dev["mean_loss"], host["mean_loss"], rtol=1e-5)


def test_device_eval_no_shuffle_subsample_matches_host():
    """shuffle=False with num_point < stored points: both paths take the
    FIRST num_point points, so the device program must match the host
    evaluate exactly even with subsampling in play (the seg/cross-domain
    eval protocols run exactly this configuration)."""
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=40, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset()  # 64 stored points > num_point=40
    n = 19
    pts, lbl = data["points"][:n], data["labels"][:n]
    state = trainer.init_state(0)
    host = trainer.evaluate(state, pts, lbl, num_votes=2, shuffle=False)
    dev = trainer.evaluate_device(
        state, trainer.upload_dataset({"points": pts, "labels": lbl}),
        num_votes=2, shuffle=False,
    )
    np.testing.assert_array_equal(dev["predictions"], host["predictions"])
    assert dev["accuracy"] == host["accuracy"]
    np.testing.assert_allclose(dev["mean_loss"], host["mean_loss"], rtol=1e-5)


def test_cross_domain_drivers_run_on_device_path():
    """The cross-domain eval drivers (now dispatching the device-resident
    no-shuffle program) produce the mapped-accuracy result dicts end-to-end:
    class filtering, prediction mapping, per-class tables."""
    from scanobjectnn_tpu.train import evaluate as ev

    rng = np.random.RandomState(0)
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=40, num_point=32, batch_size=8
    )
    tr = Trainer(cfg)
    st = tr.init_state(0)
    data = rng.randn(21, 32, 3).astype(np.float32)
    labels = rng.randint(0, 15, 21)
    r = ev.evaluate_real_trained_on_synthetic(tr, st, data, labels, num_votes=2)
    assert 0 < r["total_seen"] <= 21  # only mappable classes kept
    assert "per_class_accuracy_mapped" in r
    assert len(r["mapped_predictions"]) == r["total_seen"]

    cfg2 = TrainerConfig(
        model="pointnet_cls_basic", num_classes=15, num_point=32, batch_size=8
    )
    tr2 = Trainer(cfg2)
    st2 = tr2.init_state(0)
    m40 = rng.randint(0, 40, 23)
    r2 = ev.evaluate_synthetic_trained_on_real(
        tr2, st2, rng.randn(23, 32, 3).astype(np.float32), m40, num_votes=2
    )
    assert 0 < r2["total_seen"] <= 23
    assert "per_class_accuracy_modelnet" in r2


@pytest.mark.slow
def test_device_eval_seg_accuracy_matches_host():
    """The seg tally (masks) of evaluate_device matches the host path."""
    cfg = TrainerConfig(
        model="pointnet2_cls_bga", num_classes=3, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset(with_mask=True)
    n = 19
    pts, lbl = data["points"][:n, :48], data["labels"][:n]
    masks = data["masks"][:n, :48]
    state = trainer.init_state(0)
    host = trainer.evaluate(
        state, pts, lbl, masks=masks, num_votes=2, shuffle=False
    )
    dev = trainer.evaluate_device(
        state,
        trainer.upload_dataset({"points": pts, "labels": lbl, "masks": masks}),
        num_votes=2,
    )
    np.testing.assert_array_equal(dev["predictions"], host["predictions"])
    assert dev["accuracy"] == host["accuracy"]
    np.testing.assert_allclose(
        dev["seg_accuracy"], host["seg_accuracy"], rtol=1e-6
    )


class TestPointCNNRecipe:
    """The PointCNN settings-module training half must reach the trainer
    (reference: PointCNN/train.py:125-172 + modelnet_x3_l4.py:25-46)."""

    def _trainer(self, **kw):
        cfg = TrainerConfig(model="pointcnn_cls", num_classes=3, num_point=48,
                            batch_size=8, **kw)
        return Trainer(cfg)

    def test_step_based_lr_schedule_values(self):
        t = self._trainer()
        lr = t.lr_schedule
        assert float(lr(0)) == pytest.approx(0.01)
        assert float(lr(7999)) == pytest.approx(0.01)
        assert float(lr(8000)) == pytest.approx(0.005)
        assert float(lr(16000)) == pytest.approx(0.0025)
        np.testing.assert_allclose(float(lr(10_000_000)), 1e-6, rtol=1e-6)

    def test_recipe_fields(self):
        t = self._trainer()
        r = t.recipe
        assert r is not None
        assert r.weight_decay == 1e-5
        assert r.adam_epsilon == 1e-2
        assert r.augment == "pointcnn"
        assert r.jitter == 0.0
        assert tuple(r.rotation_range[:3]) == (0.0, float(np.pi), 0.0)
        assert r.rotation_range[3] == "u"
        assert tuple(r.scaling_range[:3]) == (0.1, 0.1, 0.1)
        assert r.scaling_range[3] == "g"

    def test_weight_decay_applied(self):
        """Zero gradients + L2 → nonzero updates (grad := wd·w before Adam,
        the tf.losses regularization-in-loss semantics)."""
        import jax.numpy as jnp

        t = self._trainer()
        params = {"w": jnp.ones((4,), jnp.float32)}
        opt_state = t.tx.init(params)
        grads = {"w": jnp.zeros((4,), jnp.float32)}
        updates, _ = t.tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["w"]).max()) > 0.0

    def test_augment_uses_pointcnn_xforms(self):
        from scanobjectnn_tpu import augment as aug

        t = self._trainer()
        key = jax.random.PRNGKey(42)
        pts = jnp.asarray(np.random.RandomState(0).randn(4, 16, 3), jnp.float32)
        got = t._augment(key, pts)
        want = aug.pointcnn_augment(
            key, pts, jitter_range=0.0,
            rotation_range=t.recipe.rotation_range,
            scaling_range=t.recipe.scaling_range,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        # and differs from the pointnet-style rotate+jitter recipe
        k1, k2 = jax.random.split(key)
        other = aug.jitter_point_cloud(k2, aug.rotate_point_cloud(k1, pts))
        assert not np.allclose(np.asarray(got), np.asarray(other))

    def test_no_recipe_falls_back_to_generic_flags(self):
        t = self._trainer(use_model_recipe=False, learning_rate=1e-3)
        assert t.recipe is None
        assert float(t.lr_schedule(0)) == pytest.approx(1e-3)


def test_partseg_eval_reports_per_part_table():
    """evaluate() must produce the reference's per-part accuracy tallies
    (pointnet/evaluate_partseg.py:166-185): per-part-id point accuracy,
    -1.0 for unseen parts, avg over seen parts."""
    cfg = TrainerConfig(
        model="pointnet_partseg", num_classes=6, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset()
    rng = np.random.RandomState(0)
    parts = rng.randint(0, 4, data["points"].shape[:2])  # parts 4,5 unseen
    state = trainer.init_state(0)
    ev = trainer.evaluate(
        state, data["points"], data["labels"], parts=parts, num_votes=1
    )
    per_part = ev["per_part_accuracy"]
    assert per_part.shape == (6,)
    assert (per_part[4:] == -1.0).all()  # unseen parts marked -1
    assert ((0 <= per_part[:4]) & (per_part[:4] <= 1)).all()
    assert ev["avg_part_accuracy"] == pytest.approx(float(per_part[:4].mean()))
    # Tallies cover every evaluated point.
    assert ev["seg_accuracy"] >= 0


def test_device_eval_per_part_table_matches_host():
    """The device-resident eval's on-device per-part tallies reproduce the
    host evaluate's table exactly (no-subsample, no-shuffle config)."""
    cfg = TrainerConfig(
        model="pointnet_partseg", num_classes=6, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset(n=48)
    rng = np.random.RandomState(0)
    parts = rng.randint(0, 4, data["points"].shape[:2])
    n = 19  # padded remainder
    pts, lbl, prt = data["points"][:n], data["labels"][:n], parts[:n]
    state = trainer.init_state(0)
    host = trainer.evaluate(
        state, pts, lbl, parts=prt, num_votes=2, shuffle=False
    )
    dev = trainer.evaluate_device(
        state,
        trainer.upload_dataset({"points": pts, "labels": lbl, "parts": prt}),
        num_votes=2, shuffle=False,
    )
    np.testing.assert_allclose(
        dev["per_part_accuracy"], host["per_part_accuracy"]
    )
    assert dev["avg_part_accuracy"] == pytest.approx(host["avg_part_accuracy"])
    np.testing.assert_allclose(dev["seg_accuracy"], host["seg_accuracy"])


def test_fused_votes_match_host_vote_loop():
    """eval_votes (all rotations in one device program) must reproduce the
    per-vote host loop: summed logits allclose, loss = Σ_v loss_v / V —
    including sum-reduction loss terms (PointNet's mat_diff penalty)."""
    cfg = TrainerConfig(
        model="pointnet_cls", num_classes=3, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset()
    state = trainer.init_state(0)
    batch = {k: v[:8] for k, v in data.items()}
    votes = 5
    out = trainer.eval_votes(state, batch, num_votes=votes)
    pred_sum = np.zeros((8, 3), np.float32)
    loss = 0.0
    for vote in range(votes):
        o = trainer.eval_step(
            state, batch, rotate_angle=vote / votes * 2.0 * np.pi
        )
        pred_sum += np.asarray(o["logits"], np.float32)
        loss += float(o["loss"]) / votes
    np.testing.assert_allclose(
        np.asarray(out["logits_sum"]), pred_sum, rtol=2e-5, atol=2e-5
    )
    assert float(out["loss"]) == pytest.approx(loss, rel=1e-4)


def test_fused_votes_seg_logits():
    cfg = TrainerConfig(
        model="pointnet_seg", num_classes=3, num_point=48, batch_size=8
    )
    trainer = Trainer(cfg)
    data = _dataset(with_mask=True)
    state = trainer.init_state(0)
    batch = {k: v[:8] for k, v in data.items()}
    out = trainer.eval_votes(state, batch, num_votes=3)
    want = np.zeros_like(np.asarray(out["seg_logits_sum"]))
    for vote in range(3):
        o = trainer.eval_step(state, batch, rotate_angle=vote / 3 * 2.0 * np.pi)
        want += np.asarray(o["seg_logits"], np.float32)
    np.testing.assert_allclose(
        np.asarray(out["seg_logits_sum"]), want, rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_seg_weight_reaches_loss_through_cli_flags():
    """--seg_weight must change the trained loss composition: w=0 → pure cls
    CE, w=1 → pure seg CE (reference threads FLAGS.seg_weight into get_loss,
    pointnet2/train_seg.py:150; round-2 VERDICT found the flag inert)."""
    import argparse

    import optax

    from scanobjectnn_tpu.models import losses
    from scanobjectnn_tpu.train import cli as cli_mod

    data = _dataset(with_mask=True)
    batch = {k: v[:8] for k, v in data.items()}

    def run(w):
        p = argparse.ArgumentParser()
        cli_mod._add_common_flags(p)
        args = p.parse_args([
            "--model", "pointnet2_cls_bga", "--num_class", "3",
            "--num_point", "48", "--batch_size", "8",
            "--seg_weight", str(w), "--log_dir", "",
        ])
        trainer = cli_mod._make_trainer(args, "seg")
        state = trainer.init_state(0)
        return trainer.eval_step(state, batch)

    out0 = run(0.0)
    cls = float(losses.softmax_cross_entropy(
        jnp.asarray(out0["logits"]), jnp.asarray(batch["labels"])
    ))
    assert float(out0["loss"]) == pytest.approx(cls, rel=1e-5)

    out1 = run(1.0)
    per_point = optax.softmax_cross_entropy_with_integer_labels(
        jnp.asarray(out1["seg_logits"], jnp.float32),
        jnp.asarray(batch["masks"], jnp.int32),
    )
    seg = float(jnp.mean(per_point))
    assert float(out1["loss"]) == pytest.approx(seg, rel=1e-5)
    assert abs(cls - seg) > 1e-6  # the two compositions actually differ


@pytest.mark.slow
def test_reg_weight_scales_tnet_penalty():
    """--reg_weight scales the T-Net orthogonality term (pointnet_cls.py:93)."""
    base = dict(model="pointnet_cls", num_classes=3, num_point=48, batch_size=8)
    data = _dataset()
    batch = {k: v[:8] for k, v in data.items()}
    # One train step to move the T-Net off its identity init (where the
    # penalty is exactly zero and the flag would be unobservable).
    t = Trainer(TrainerConfig(**base, learning_rate=1e-2))
    state = t.init_state(0)
    state, _ = t.train_step(state, batch, jax.random.PRNGKey(0))

    def loss_at(rw):
        tr = Trainer(TrainerConfig(**base, reg_weight=rw))
        assert tr._loss_fn.keywords["reg_weight"] == rw
        return float(tr.eval_step(state, batch)["loss"])

    l0, l10 = loss_at(0.0), loss_at(10.0)
    assert l10 > l0  # nonzero penalty, scaled by the flag


@pytest.mark.slow
def test_fit_writes_metrics_best_and_snapshot(tmp_path):
    """fit() must leave the reference's log-dir artifacts: metrics.jsonl
    scalar history, best-accuracy checkpoint + marker (3DmFV-Net/
    train.py:232-237), and a source snapshot (pointnet2/train.py:72-74)."""
    import json

    log_dir = str(tmp_path / "log")
    cfg = TrainerConfig(
        model="pointnet_cls_basic", num_classes=3, num_point=48, batch_size=8,
        max_epoch=2, log_dir=log_dir,
    )
    trainer = Trainer(cfg)
    data = _dataset()
    trainer.fit(data, test_data=data)

    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    assert os.path.isfile(metrics_path)
    records = [json.loads(l) for l in open(metrics_path)]
    assert len(records) == 2
    assert "train_mean_loss" in records[0] and "eval_accuracy" in records[0]
    assert "best_accuracy" in records[1]
    assert records[1]["best_accuracy"] >= records[1]["eval_accuracy"] - 1e-9

    assert os.path.isdir(os.path.join(log_dir, "checkpoint_best"))
    assert os.path.isfile(os.path.join(log_dir, "best.json"))
    snap = os.path.join(log_dir, "src_snapshot")
    assert os.path.isfile(os.path.join(snap, "trainer.py"))
    assert os.path.isfile(os.path.join(snap, "pointnet.py"))


@pytest.mark.slow
def test_resume_continues_from_sidecars(tmp_path):
    """--resume must pick up the epoch counter and best-so-far accuracy from
    the checkpoint sidecars (last.json / best.json): a restarted run neither
    re-trains completed epochs nor clobbers checkpoint_best with a worse
    state (ref protocol: 3DmFV-Net/train.py best tracking + per-epoch ckpt)."""
    import json

    log_dir = str(tmp_path / "log")
    data = _dataset()

    def run(max_epoch, resume):
        cfg = TrainerConfig(
            model="pointnet_cls_basic", num_classes=3, num_point=48,
            batch_size=8, max_epoch=max_epoch, log_dir=log_dir,
        )
        Trainer(cfg).fit(data, test_data=data, resume=resume)

    run(max_epoch=2, resume=False)
    first_best = json.load(open(os.path.join(log_dir, "best.json")))
    assert first_best.get("accuracy", -1) >= 0
    assert json.load(open(os.path.join(log_dir, "last.json")))["epoch"] == 1

    run(max_epoch=4, resume=True)
    records = [
        json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))
    ]
    # 2 epochs from the first run + exactly 2 more (2, 3) from the resume
    assert [r["epoch"] for r in records] == [0, 1, 2, 3]
    second_best = json.load(open(os.path.join(log_dir, "best.json")))
    assert second_best["accuracy"] >= first_best["accuracy"]
    assert json.load(open(os.path.join(log_dir, "last.json")))["epoch"] == 3


def test_synth_hard_results_show_bga_advantage():
    """Coarse ordering assertion over the committed synthetic-hard results
    (synth_hard.json, produced on the TPU by scripts/synthetic_hard_bench.py):
    every BGA variant must beat its plain counterpart — the paper's core
    claim (ref pointnet2/models/pointnet2_cls_bga.py) — and every f32 row
    must clear chance by a wide margin.  A model-quality regression that
    survives the unit tests moves these numbers; re-run the script and this
    test pins whether the ordering still holds."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "synth_hard.json")
    if not os.path.isfile(path):
        pytest.skip("synth_hard.json not generated yet")
    raw = json.load(open(path))
    rows = {
        (r["model"], r["dtype"]): r["accuracy"]
        for r in raw
        if r.get("accuracy") is not None  # partseg rows carry no cls head
    }
    chance = 1.0 / 6.0
    pairs = [
        ("pointnet_cls_basic", "pointnet_seg"),
        ("pointnet2_cls_ssg", "pointnet2_cls_bga"),
        ("dgcnn", "dgcnn_bga"),
    ]
    for plain, bga in pairs:
        p, b = rows[(plain, "float32")], rows[(bga, "float32")]
        assert b > p, f"BGA {bga}={b} does not beat plain {plain}={p}"
    for (model, dtype), acc in rows.items():
        if dtype == "float32":
            assert acc > 2 * chance, f"{model} f32 near chance: {acc}"
    # Partseg rows (when present) must clear 3-way-part chance on the part
    # table — their discriminating core is the fg-vs-distractor split.
    for r in raw:
        if r.get("avg_part_accuracy") is not None:
            assert r["avg_part_accuracy"] > 0.5, r


@pytest.mark.slow
def test_reproduce_table5_dry_run(tmp_path, monkeypatch):
    """The Table-5 harness must not rot silently: run --dry_run end-to-end
    (synthetic h5 tree, 1 epoch, 2 rows covering both driver kinds) and
    assert the markdown table is written with one line per row.  The real
    run differs only in data/epochs/votes (scripts/reproduce_table5.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reproduce_table5",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "reproduce_table5.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "table5_results.md"
    mod.main([
        "--dry_run",
        "--models", "pointnet_cls,pointnet2_cls_bga",
        "--output", str(out),
    ])
    table = out.read_text()
    assert "DRY RUN" in table
    assert "| pointnet_cls |" in table
    assert "| pointnet2_cls_bga |" in table
    # Every row carries a parsed accuracy cell (harness produced numbers).
    rows = [l for l in table.splitlines() if l.startswith("| pointnet")]
    assert len(rows) == 2
    for row in rows:
        float(row.split("|")[3])  # "Ours" column parses as a number
