"""End-to-end training on tiny synthetic data: loss decreases and accuracy
beats chance within a few epochs; checkpoint save/restore round-trips.
The reference has no such test (SURVEY.md §4 item (d) — net-new fixture)."""

import os

import jax
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
