"""Dataset layer tests: h5 round-trips, normalization, epoch sampling
semantics (shared point permutation), mask co-sampling, PLY round-trip."""

import numpy as np
import pytest

from scanobjectnn_tpu.data import io, mappings, pipeline, synthetic


def test_h5_roundtrip(tmp_path):
    data, label, mask = synthetic.make_synthetic_dataset(
        num_per_class=2, num_classes=3, num_points=32, with_mask=True
    )
    path = str(tmp_path / "x.h5")
    io.save_h5(path, data, label, mask=mask)
    d2, l2, m2 = io.load_withmask_h5(path)
    np.testing.assert_allclose(d2, data)
    np.testing.assert_array_equal(l2, label)
    np.testing.assert_array_equal(m2, mask)


def test_center_and_normalize():
    rng = np.random.RandomState(0)
    pcs = rng.rand(4, 50, 3).astype(np.float32) * 3 + 1
    centered = io.center_data(pcs)
    np.testing.assert_allclose(centered.mean(axis=1), 0, atol=1e-5)
    normed = io.normalize_data(centered)
    norms = np.sqrt((normed**2).sum(-1)).max(axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_convert_to_binary_mask():
    masks = np.array([[0, -1, 3], [-1, -1, 2]])
    out = io.convert_to_binary_mask(masks)
    np.testing.assert_array_equal(out, [[1, 0, 1], [0, 0, 1]])


def test_epoch_sampler_shared_permutation():
    """All clouds in an epoch must share ONE point permutation
    (ref data_utils.py:171-186)."""
    b, n = 6, 40
    # Encode the point index in the coordinates so we can recover it.
    data = np.tile(np.arange(n, dtype=np.float32)[None, :, None], (b, 1, 3))
    labels = np.arange(b)
    masks = np.tile(np.arange(n)[None], (b, 1))
    s = pipeline.EpochSampler(data, labels, masks=masks, num_points=16, seed=0)
    view = s.epoch()
    pts = view["points"][..., 0].astype(int)
    # Same permutation across all clouds:
    assert (pts == pts[0]).all()
    # Mask co-sampled with the same permutation:
    np.testing.assert_array_equal(view["masks"], pts)
    # Cloud order shuffled but label-consistent (labels encode original row).
    assert set(view["labels"].tolist()) == set(range(b))


def test_epoch_sampler_no_shuffle():
    data = np.random.RandomState(0).rand(3, 20, 3).astype(np.float32)
    labels = np.arange(3)
    s = pipeline.EpochSampler(data, labels, num_points=8, shuffle=False)
    view = s.epoch()
    np.testing.assert_allclose(view["points"], data[:, :8])
    np.testing.assert_array_equal(view["labels"], labels)


def test_batches_drop_remainder():
    view = {"points": np.zeros((10, 4, 3)), "labels": np.arange(10)}
    batches = list(pipeline.Batches(view, batch_size=4))
    assert len(batches) == 2
    assert batches[0]["points"].shape == (4, 4, 3)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(17, 3).astype(np.float32)
    colors = rng.rand(17, 3).astype(np.float32)
    path = str(tmp_path / "x.ply")
    io.save_ply(pts, path, colors=colors)
    back = io.load_ply(path)
    np.testing.assert_allclose(
        np.stack([back["x"], back["y"], back["z"]], 1), pts, rtol=1e-6
    )
    assert back["red"].dtype == np.uint8


def test_mappings_roundtrip():
    for m40, scan in mappings.MODELNET_TO_OBJECTDATASET.items():
        assert m40 in mappings.OBJECTDATASET_TO_MODELNET[scan]
    preds = np.array([2, 4, 8, 0])
    mapped = mappings.modelnet_pred_to_scanobjectnn(preds)
    np.testing.assert_array_equal(mapped, [10, 8, 4, -1])
    ok = mappings.is_correct_on_modelnet(np.array([4, 4, 3]), np.array([8, 32, 14]))
    np.testing.assert_array_equal(ok, [True, True, True])
    assert not mappings.is_correct_on_modelnet(np.array([4]), np.array([14]))[0]


def test_bin_loader(tmp_path):
    # Build a synthetic 11-float .bin object: 6 fg points (class 5) + 3 bg.
    n = 9
    rows = np.zeros((n, 11), dtype=np.float32)
    rows[:, 0:3] = np.arange(n * 3).reshape(n, 3)
    rows[:, -1] = [0, 1, 2, 5, 5, 5, 5, 5, 5]
    raw = np.concatenate([[np.float32(n)], rows.flatten()]).astype(np.float32)
    path = str(tmp_path / "obj.bin")
    raw.tofile(path)
    with_bg = io.load_pc_file(path, with_bg=True)
    assert with_bg.shape == (n, 3)
    no_bg = io.load_pc_file(path, with_bg=False)
    assert no_bg.shape == (6, 3)
    np.testing.assert_allclose(no_bg, rows[3:, 0:3])


def test_split_parsing(tmp_path):
    from scanobjectnn_tpu.data import splits

    p = tmp_path / "split.txt"
    p.write_text("a.bin\t0\nb.bin\t3\tt\nc.bin\t14\n")
    entries = splits.load_split(str(p))
    assert len(entries) == 3
    train, test = splits.split_train_test(entries)
    assert [e.filename for e in train] == ["a.bin", "c.bin"]
    assert test[0].label == 3 and test[0].is_test


def test_ragged_epoch_sampler():
    """Raw .bin datasets have per-cloud sizes; epoch sampling subsamples each
    cloud independently (ref data_utils.get_current_data:108-131)."""
    rng = np.random.RandomState(0)
    pcs = [rng.rand(n, 3).astype(np.float32) for n in (40, 55, 32, 80)]
    labels = np.array([0, 1, 2, 3])
    s = pipeline.EpochSampler(pcs, labels, num_points=16, seed=0)
    view = s.epoch()
    assert view["points"].shape == (4, 16, 3)
    assert set(view["labels"].tolist()) == {0, 1, 2, 3}
    # Sampled points come from the right cloud (values match originals).
    order = view["labels"]
    for i, lbl in enumerate(order):
        src = {tuple(r) for r in pcs[lbl]}
        assert all(tuple(r) in src for r in view["points"][i])
    # Too-small clouds raise.
    with pytest.raises(ValueError):
        pipeline.EpochSampler([np.zeros((4, 3))], np.array([0]), num_points=16).epoch()


def test_load_data_pickle_of_bins(tmp_path):
    """End-to-end raw-dataset path: pickled entry list -> per-file .bin parse
    (ref data_utils.load_data:77-106, incl. the too-few-points drop rule)."""
    import pickle

    rng = np.random.RandomState(0)
    entries = []
    for i, n in enumerate((30, 40, 4)):  # third is dropped (< num_points)
        rows = np.zeros((n, 11), dtype=np.float32)
        rows[:, 0:3] = rng.rand(n, 3)
        rows[:, -1] = 5
        raw = np.concatenate([[np.float32(n)], rows.flatten()]).astype(np.float32)
        fname = f"obj{i}.bin"
        raw.tofile(str(tmp_path / fname))
        entries.append({"filename": f"objects_bin/{fname}", "label": i})
    pkl = str(tmp_path / "dataset.pickle")
    with open(pkl, "wb") as f:
        pickle.dump(entries, f)
    pcs, labels = io.load_data(pkl, num_points=16, data_dir=str(tmp_path))
    assert len(pcs) == 2 and labels == [0, 1]
    assert pcs[0].shape == (30, 3) and pcs[1].shape == (40, 3)


def test_discriminator_types_cosampled():
    """Model-type labels shuffle with cloud order
    (ref get_current_data_discriminator_h5)."""
    rng = np.random.RandomState(0)
    data = rng.rand(6, 20, 3).astype(np.float32)
    labels = np.arange(6)
    types = np.arange(6) * 10
    s = pipeline.EpochSampler(data, labels, types=types, num_points=8, seed=0)
    view = s.epoch()
    np.testing.assert_array_equal(view["types"], view["labels"] * 10)


def test_ragged_epoch_sampler_cosamples_masks_parts_types():
    """Ragged (.bin) epoch views co-sample masks/parts with the same
    per-cloud permutation and co-shuffle types with cloud order."""
    rng = np.random.RandomState(1)
    pcs, masks, parts = [], [], []
    for n in (40, 55, 32):
        # Encode the point's original row index in the x coordinate so mask
        # alignment is checkable after shuffling.
        pc = np.zeros((n, 3), np.float32)
        pc[:, 0] = np.arange(n)
        pcs.append(pc)
        masks.append(np.arange(n) % 2)
        parts.append(np.arange(n) % 5)
    labels = np.array([0, 1, 2])
    types = np.array([7, 8, 9])
    s = pipeline.EpochSampler(
        pcs, labels, masks=masks, parts=parts, types=types, num_points=16, seed=3
    )
    view = s.epoch()
    assert view["masks"].shape == (3, 16)
    assert view["parts"].shape == (3, 16)
    for i in range(3):
        rows = view["points"][i, :, 0].astype(int)
        np.testing.assert_array_equal(view["masks"][i], rows % 2)
        np.testing.assert_array_equal(view["parts"][i], rows % 5)
    # types follow their cloud: label k was built with type k+7.
    np.testing.assert_array_equal(view["types"], view["labels"] + 7)


def test_padded_batches_cover_every_sample():
    """padded_batches pads the final partial batch and reports valid counts —
    no remainder drop (reference protocol: BATCH_SIZE=1 eval drops nothing)."""
    view = {
        "points": np.arange(19 * 4 * 3, dtype=np.float32).reshape(19, 4, 3),
        "labels": np.arange(19),
    }
    seen = []
    for batch, valid in pipeline.padded_batches(view, 8):
        assert batch["labels"].shape == (8,)
        assert batch["points"].shape == (8, 4, 3)
        seen.extend(batch["labels"][:valid].tolist())
    assert seen == list(range(19))
    # Padding repeats the last real row.
    last_batch, valid = list(pipeline.padded_batches(view, 8))[-1]
    assert valid == 3
    np.testing.assert_array_equal(last_batch["labels"][3:], [18] * 5)


def test_bin_loader_keeps_negative_semantic_labels(tmp_path):
    """with_bg=False must keep negative semantic labels (e.g. -1 unannotated)
    as foreground candidates — the reference filter is !=0,!=1,!=2, not >2."""
    n = 30
    rows = np.zeros((n, 11), dtype=np.float32)
    rows[:, 0:3] = np.random.RandomState(0).rand(n, 3)
    rows[:20, -1] = -1.0  # dominant "class": unannotated
    rows[20:, -1] = 1.0  # floor background
    raw = np.concatenate([[np.float32(n)], rows.flatten()]).astype(np.float32)
    path = str(tmp_path / "neg.bin")
    raw.tofile(path)
    pc = io.load_pc_file(path, with_bg=False)
    assert pc.shape == (20, 3)
    np.testing.assert_allclose(pc, rows[:20, 0:3])


def test_hard_synthetic_two_body_structure():
    """The hard fixture must contain TWO ellipsoid bodies per cloud — the
    labeled foreground plus a wrong-class distractor — so a pooled global
    feature is ambiguous and only the mask supervision disambiguates
    (the BGA mechanism, ref pointnet2/models/pointnet2_cls_bga.py)."""
    pts, labels, masks = synthetic.make_hard_synthetic_dataset(
        num_per_class=4, num_classes=6, num_points=256, seed=3
    )
    assert pts.shape == (24, 256, 3) and pts.dtype == np.float32
    assert labels.shape == (24,) and masks.shape == (24, 256)
    assert set(np.unique(masks)) == {-1, 0}
    # 50% clutter, split half distractor / half uniform.
    np.testing.assert_array_equal((masks == -1).sum(axis=1), 128)
    for i in range(pts.shape[0]):
        fg = pts[i][masks[i] == 0]
        bg = pts[i][masks[i] == -1]
        # Foreground is an origin-centered shell (ellipsoid surface).
        assert np.linalg.norm(fg.mean(axis=0)) < 0.1
        # The distractor body sits OFF-center: half the bg points form a
        # body offset by 0.70-1.00 while the uniform half centers at the
        # origin, so the combined bg centroid is displaced ~0.35-0.5.
        assert np.linalg.norm(bg.mean(axis=0)) > 0.2
    # Labels balanced, classes distinguishable by foreground extents.
    assert [int((labels == c).sum()) for c in range(6)] == [4] * 6


def test_hard_synthetic_foreground_carries_class_signal():
    """Per-class foreground axis extents must follow the prototype grid —
    i.e. the class signal lives in the fg shape, not the clutter."""
    pts, labels, masks = synthetic.make_hard_synthetic_dataset(
        num_per_class=20, num_classes=6, num_points=256, seed=0
    )
    stds = []
    for c in range(6):
        sel = labels == c
        fg = np.concatenate([p[m == 0] for p, m in zip(pts[sel], masks[sel])])
        stds.append(fg.std(axis=0))
    stds = np.array(stds)
    # Axis-2 ratio decreases in prototype pairs (0,1)>(2,3)>(4,5).
    pair_axis2 = stds[:, 1].reshape(3, 2).mean(axis=1)
    assert pair_axis2[0] > pair_axis2[1] > pair_axis2[2]
    # Axis-3 alternates large/small within each pair.
    assert all(stds[2 * i, 2] > stds[2 * i + 1, 2] for i in range(3))
