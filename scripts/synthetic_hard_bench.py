#!/usr/bin/env python
"""Synthetic-hard benchmark: a DISCRIMINATING model-quality check.

The easy synthetic fixture separates trivially (every family reaches 1.000
— round-2 VERDICT: such checks cannot catch a model-quality regression).
This harness trains on ``make_hard_synthetic_dataset`` — near-confusable
ellipsoid classes sharing each cloud with a wrong-class distractor body
plus uniform clutter (all mask −1) — where:

  * per-family accuracies SEPARATE (a quality regression moves them), and
  * the BGA (background-aware) variants should beat their plain
    counterparts, the paper's core claim
    (/root/reference/pointnet2/models/pointnet2_cls_bga.py).

It also measures the f32-vs-bf16 converged-accuracy delta for the families
where bf16 buys real speed (round-2 VERDICT item 8), so the dtype default
can be documented from data.

Run on the TPU chip:  python scripts/synthetic_hard_bench.py
Results land in SYNTH_HARD.md (markdown table) + synth_hard.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (model, supervision, dtype) rows; supervision False = labels only,
# True = labels + fg/bg masks (BGA/seg), "parts" = 3-way part ids.
# Plain/BGA pairs adjacent; full registry coverage (round-3 VERDICT 4).
ROWS = [
    ("pointnet_cls_basic", False, "float32"),
    ("pointnet_cls", False, "float32"),  # + T-Net variant
    ("pointnet_seg", True, "float32"),
    ("pointnet2_cls_ssg", False, "float32"),
    ("pointnet2_cls_msg", False, "float32"),  # MSG-vs-SSG quality signal
    ("pointnet2_cls_bga", True, "float32"),
    ("dgcnn", False, "float32"),
    ("dgcnn_bga", True, "float32"),
    ("spidercnn_cls_xyz", False, "float32"),
    ("3dmfv_net_cls", False, "float32"),
    ("pointcnn_cls", False, "float32"),
    ("pointcnn_seg", True, "float32"),
    # Partseg: 3-way part ids (fg / distractor / clutter); the fg-vs-
    # distractor split is the task's hard core, so per-part accuracy is a
    # real quality signal.  One row per partseg family.
    ("pointnet2_cls_partseg", "parts", "float32"),
    ("pointnet_partseg", "parts", "float32"),
    # bf16 deltas for the families where bf16 buys real speed
    # (pointnet 1.8x, pointcnn 10%, pointnet2 ~1.3x — BENCHMARKS.md).
    ("pointnet_cls_basic", False, "bfloat16"),
    ("pointnet2_cls_ssg", False, "bfloat16"),
    ("pointcnn_cls", False, "bfloat16"),
]


def build_data(num_points: int, seed_train=0, seed_test=1):
    from scanobjectnn_tpu.data import io, synthetic

    pts, labels, masks, parts = synthetic.make_hard_synthetic_dataset(
        num_per_class=100, num_classes=6, num_points=num_points,
        seed=seed_train, return_parts=True,
    )
    tpts, tlabels, tmasks, tparts = synthetic.make_hard_synthetic_dataset(
        num_per_class=60, num_classes=6, num_points=num_points,
        seed=seed_test, return_parts=True,
    )
    pts = io.normalize_data(io.center_data(pts))
    tpts = io.normalize_data(io.center_data(tpts))
    train = {
        "points": pts, "labels": labels,
        "masks": io.convert_to_binary_mask(masks), "parts": parts,
    }
    test = {
        "points": tpts, "labels": tlabels,
        "masks": io.convert_to_binary_mask(tmasks), "parts": tparts,
    }
    return train, test


def run_row(model, supervision, dtype, train, test, args):
    from scanobjectnn_tpu.train import Trainer, TrainerConfig

    partseg = supervision == "parts"
    cfg = TrainerConfig(
        # partseg models take num_parts via num_classes (Trainer.__init__).
        model=model, num_classes=3 if partseg else 6,
        num_point=args.num_point,
        batch_size=24, max_epoch=args.epochs, learning_rate=1e-3,
        seed=0, dtype=dtype, augment_rotate=False,
    )
    trainer = Trainer(cfg)
    tr = {"points": train["points"], "labels": train["labels"]}
    if supervision is True:
        tr["masks"] = train["masks"]
    elif partseg:
        tr["parts"] = train["parts"]
    t0 = time.time()
    state = trainer.fit(tr)
    ev = trainer.evaluate(
        state, test["points"], test["labels"],
        masks=test["masks"] if supervision is True else None,
        parts=test["parts"] if partseg else None,
        num_votes=1,
    )
    return {
        "model": model, "dtype": dtype, "bga": supervision is True,
        # cls accuracy when the model has a cls head; partseg rows have none.
        "accuracy": round(float(ev["accuracy"]), 4)
        if "accuracy" in ev else None,
        "seg_accuracy": round(float(ev.get("seg_accuracy", -1.0)), 4),
        "avg_part_accuracy": round(float(ev["avg_part_accuracy"]), 4)
        if "avg_part_accuracy" in ev else None,
        "wall_sec": round(time.time() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    # 150, not 60: the BGA models' joint loss slows their cls convergence
    # (measured: pointnet_seg train-acc still climbing at epoch 59); equal
    # LONG budgets are the fair comparison.
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--num_point", type=int, default=128)
    p.add_argument("--models", default=None,
                   help="comma list filter; entries are 'model' or "
                   "'model:dtype' to select one dtype row")
    p.add_argument("--output", default="SYNTH_HARD.md")
    p.add_argument("--json", dest="json_out", default="synth_hard.json")
    p.add_argument("--merge", action="store_true",
                   help="merge the rows run now into an existing json "
                   "(rewrite only those; keep the rest) — lets a new row "
                   "land without re-training the whole table")
    p.add_argument("--pool_f32", nargs="?", const="1", default=None,
                   choices=["1", "keys"],
                   help="set SCANOBJECTNN_SA_POOL_F32=<mode> (exact-pool "
                   "mixed precision; '1' = f32 final layer, 'keys' = "
                   "exact-key pooling) and tag the rows' dtype so they "
                   "merge as distinct entries")
    args = p.parse_args(argv)
    if args.pool_f32:
        os.environ["SCANOBJECTNN_SA_POOL_F32"] = args.pool_f32

    # Clouds carry 2x the training point count (the h5 convention: 2048-pt
    # clouds subsampled to --num_point per epoch).  At num_point < ~512 the
    # pointnet2 family is architecturally degenerate (SA1 wants 512 FPS
    # centroids), so family ORDERING needs >= 512; within-pair (plain vs
    # BGA) comparisons are fair at any size.
    train, test = build_data(2 * args.num_point)
    selected = set(args.models.split(",")) if args.models else None
    results = []
    for model, supervision, dtype in ROWS:
        if selected and not {model, f"{model}:{dtype}"} & selected:
            continue
        print(f"=== {model} ({dtype}) ===", flush=True)
        r = run_row(model, supervision, dtype, train, test, args)
        if args.pool_f32:
            tag = "poolf32" if args.pool_f32 == "1" else "poolkeys"
            r["dtype"] = f"{dtype}+{tag}"
        results.append(r)
        print(json.dumps(r), flush=True)

    if args.merge and os.path.isfile(args.json_out):
        old = {(r["model"], r["dtype"]): r for r in json.load(open(args.json_out))}
        old.update({(r["model"], r["dtype"]): r for r in results})
        # Re-emit in ROWS order (unknown legacy rows keep their place last).
        order = {(m, d): i for i, (m, _s, d) in enumerate(ROWS)}
        results = sorted(
            old.values(), key=lambda r: order.get((r["model"], r["dtype"]), 99)
        )

    lines = [
        "# Synthetic-hard benchmark (6 confusable ellipsoid classes, "
        "wrong-class distractor + uniform clutter)",
        "",
        f"600 train / 360 test clouds, {2 * args.num_point}→{args.num_point} pts, batch 24, "
        f"{args.epochs} epochs, 1-vote eval.  BGA rows see the fg/bg mask "
        "supervision; plain rows do not.  Accuracies are the regression "
        "signal — they separate by family (unlike the easy fixture where "
        "everything hits 1.000).",
        "",
        "| Model | dtype | BGA | accuracy | seg acc | part acc | wall |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        seg = f"{r['seg_accuracy']:.3f}" if r["seg_accuracy"] >= 0 else "—"
        acc = f"{r['accuracy']:.3f}" if r.get("accuracy") is not None else "—"
        part = (
            f"{r['avg_part_accuracy']:.3f}"
            if r.get("avg_part_accuracy") is not None else "—"
        )
        lines.append(
            f"| {r['model']} | {r['dtype']} | {'yes' if r['bga'] else 'no'} "
            f"| {acc} | {seg} | {part} | {r['wall_sec']}s |"
        )
    table = "\n".join(lines) + "\n"
    # Preserve hand-written analysis sections (everything from the first
    # "## " heading onward) across table rewrites.
    if os.path.isfile(args.output):
        old_md = open(args.output).read()
        cut = old_md.find("\n## ")
        if cut >= 0:
            table = table + old_md[cut:]
    with open(args.output, "w") as f:
        f.write(table)
    with open(args.json_out, "w") as f:
        json.dump(results, f, indent=2)
    print(table)
    print(f"wrote {args.output} and {args.json_out}")


if __name__ == "__main__":
    main()
