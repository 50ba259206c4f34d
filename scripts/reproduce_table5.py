#!/usr/bin/env python
"""Turnkey paper-Table-5 reproduction harness.

Given the real ScanObjectNN h5 tree, trains and voting-evaluates all 8 paper
rows on the hardest variant (PB_T50_RS, main split — the default
``*_augmentedrot_scale75.h5`` files of every reference driver,
/root/reference/pointnet2/train.py:35-47) and emits a markdown table with
deltas vs the paper targets recorded in BASELINE.md.

Real data (one command, many hours on a single chip):

    python scripts/reproduce_table5.py --h5_dir /path/to/data  # contains h5_files/

Dry run (synthetic tiny h5 tree, tiny epochs — validates the harness
end-to-end without the non-redistributable dataset):

    python scripts/reproduce_table5.py --dry_run

Rows and reference training configs:
  * cls families (train + 12-vote evaluate): 3dmfv_net_cls, pointnet_cls,
    spidercnn_cls_xyz, pointnet2_cls_ssg, dgcnn, pointcnn_cls
    (pointnet2/train.py defaults: 250 epochs, batch 16-32, Adam 1e-3;
    PointCNN uses its settings-module recipe automatically: lr 0.01,
    step decay, weight decay 1e-5, in-graph xform augmentation, 400 epochs).
  * BGA rows (train_seg + evaluate): pointnet2_cls_bga, dgcnn_bga
    (pointnet2/train_seg.py: joint loss, seg_weight 0.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (model, driver kind, paper Table 5 overall accuracy %, epochs, batch)
ROWS = [
    ("3dmfv_net_cls", "cls", 63.0, 250, 64),
    ("pointnet_cls", "cls", 68.2, 250, 32),
    ("spidercnn_cls_xyz", "cls", 73.7, 250, 32),
    ("pointnet2_cls_ssg", "cls", 77.9, 250, 16),
    ("dgcnn", "cls", 78.1, 250, 32),
    ("pointcnn_cls", "cls", 78.5, 400, 32),
    ("dgcnn_bga", "seg", 79.7, 250, 32),
    ("pointnet2_cls_bga", "seg", 80.2, 250, 16),
]


def make_dry_tree(root: str) -> str:
    """Synthesize a tiny h5 tree shaped like the real dataset."""
    from scanobjectnn_tpu.data import synthetic

    split_dir = os.path.join(root, "h5_files", "main_split")
    os.makedirs(split_dir, exist_ok=True)
    for stem, seed, npc in (("training", 0, 4), ("test", 1, 2)):
        path = os.path.join(
            split_dir, f"{stem}_objectdataset_augmentedrot_scale75.h5"
        )
        synthetic.write_synthetic_h5(
            path, num_per_class=npc, num_classes=15, num_points=128,
            with_mask=True, seed=seed,
        )
    return root


def run_row(model, kind, h5_dir, args):
    from scanobjectnn_tpu.data import io
    from scanobjectnn_tpu.train import Trainer, TrainerConfig

    split = os.path.join(h5_dir, "h5_files", args.split)
    train_file = os.path.join(
        split, f"training_objectdataset{args.variant}.h5"
    )
    test_file = os.path.join(split, f"test_objectdataset{args.variant}.h5")

    epochs = args.epochs or dict((r[0], r[3]) for r in ROWS)[model]
    batch = dict((r[0], r[4]) for r in ROWS)[model]
    if args.dry_run:
        epochs, batch = 1, 8

    if kind == "seg":
        data, labels, masks = io.load_withmask_h5(train_file)
        tdata, tlabels, tmasks = io.load_withmask_h5(test_file)
        masks = io.convert_to_binary_mask(masks)
        tmasks = io.convert_to_binary_mask(tmasks)
    else:
        data, labels = io.load_h5(train_file)
        tdata, tlabels = io.load_h5(test_file)
        masks = tmasks = None
    labels, tlabels = np.squeeze(labels), np.squeeze(tlabels)
    data = io.normalize_data(io.center_data(data))
    tdata = io.normalize_data(io.center_data(tdata))

    cfg = TrainerConfig(
        model=model,
        num_classes=15,
        num_point=args.num_point if not args.dry_run else 64,
        batch_size=batch,
        max_epoch=epochs,
        log_dir=os.path.join(args.log_root, model),
    )
    trainer = Trainer(cfg)
    train_dict = {"points": data, "labels": labels}
    test_dict = {"points": tdata, "labels": tlabels}
    if masks is not None:
        train_dict["masks"] = masks
        test_dict["masks"] = tmasks

    t0 = time.time()
    # Pass test_data so fit tracks the best-epoch checkpoint (the reference
    # protocol: per-epoch eval + best-acc tracking, 3DmFV-Net/train.py:391-395;
    # the final 12-vote evaluation then runs on the BEST checkpoint, not the
    # last epoch's state — worth up to a few tenths, round-2 VERDICT item 7).
    # --resume lets the many-hours real run restart per row.
    state = trainer.fit(
        train_dict, test_data=test_dict, num_votes=1, resume=args.resume
    )
    best_state = trainer.restore(state, best=True)
    if best_state is not None:
        state = best_state
    # evaluate_auto routes dense test sets through the device-resident
    # one-program protocol (evaluate_device) — the host loop's ~30-60 ms
    # per-batch dispatch would cost ~10+ min across the 8 rows x 12 votes.
    ev = trainer.evaluate_auto(
        state, tdata, tlabels, masks=tmasks,
        num_votes=args.votes if not args.dry_run else 1,
    )
    return {
        "accuracy": float(ev.get("accuracy", 0.0)),
        "avg_class_accuracy": float(ev.get("avg_class_accuracy", 0.0)),
        "seg_accuracy": float(ev.get("seg_accuracy", 0.0)) if kind == "seg" else None,
        "wall_sec": round(time.time() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--h5_dir", default=None, help="directory containing h5_files/")
    p.add_argument("--split", default="main_split")
    p.add_argument("--variant", default="_augmentedrot_scale75",
                   help="'' (OBJ_BG) ... _augmentedrot_scale75 (PB_T50_RS)")
    p.add_argument("--votes", type=int, default=12)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=None, help="override all rows")
    p.add_argument("--models", default=None, help="comma list; default all 8 rows")
    p.add_argument("--log_root", default="log/table5")
    p.add_argument("--output", default="table5_results.md")
    p.add_argument("--dry_run", action="store_true",
                   help="synthetic tiny h5 tree + 1 epoch: validates the harness")
    p.add_argument("--resume", action="store_true",
                   help="resume each row from its last checkpoint in log_root")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars are too late in this "
                   "image — the sitecustomize pre-imports jax)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.dry_run:
        import tempfile

        args.h5_dir = make_dry_tree(tempfile.mkdtemp(prefix="table5_dry_"))
        args.log_root = os.path.join(args.h5_dir, "log")
    if not args.h5_dir:
        p.error("--h5_dir required (or --dry_run)")

    selected = set(args.models.split(",")) if args.models else None
    results = []
    for model, kind, target, _, _ in ROWS:
        if selected and model not in selected:
            continue
        print(f"=== {model} ===", flush=True)
        r = run_row(model, kind, args.h5_dir, args)
        r.update(model=model, target=target)
        results.append(r)
        print(json.dumps(r), flush=True)

    lines = [
        "# Table 5 reproduction (PB_T50_RS, main split)"
        + (" — DRY RUN (synthetic data; accuracies meaningless)" if args.dry_run else ""),
        "",
        "| Model | Paper | Ours | Δ | avg-class | wall |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        ours = 100.0 * r["accuracy"]
        delta = ours - r["target"]
        lines.append(
            f"| {r['model']} | {r['target']:.1f} | {ours:.1f} | {delta:+.1f} "
            f"| {100.0 * r['avg_class_accuracy']:.1f} | {r['wall_sec']}s |"
        )
    table = "\n".join(lines) + "\n"
    with open(args.output, "w") as f:
        f.write(table)
    print(table)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
