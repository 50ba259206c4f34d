#!/usr/bin/env python
"""Per-family inference (eval forward) timing — the BENCHMARKS.md
"Inference by family" table, B=32 N=1024, f32 and bf16.

Methodology: utils/chipbench.py (two-point fori_loop chains — the fixed
~24-37 ms per-call dispatch cancels; the round-3 edition of this table was
measured divide-by-iters and so carried ~+1 ms on every row, which is
material for the fast families).

Usage: python scripts/profile_family_inference.py [model ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scanobjectnn_tpu.utils.chipbench import timed_ms

B, N = 32, 1024

MODELS = [
    "pointnet_cls",
    "3dmfv_net_cls",
    "pointnet2_cls_ssg",
    "pointnet2_cls_bga",
    "pointnet2_cls_msg",
    "pointcnn_cls",
    "spidercnn_cls_xyz",
    "dgcnn",
]


def main(argv):
    from scanobjectnn_tpu import models as zoo

    names = argv or MODELS
    key = jax.random.PRNGKey(0)
    points = jax.random.normal(key, (B, N, 3), jnp.float32)
    rows = []
    for name in names:
        row = {"model": name}
        for dtype in (jnp.float32, jnp.bfloat16):
            model, _, _ = zoo.get_model(name, dtype=dtype)
            variables = model.init(
                {"params": key, "dropout": key}, points, train=False
            )

            def fwd(pts):
                out = model.apply(variables, pts, train=False)
                return out["logits"].astype(jnp.float32)

            tag = "f32" if dtype == jnp.float32 else "bf16"
            row[tag] = timed_ms(fwd, points, name=f"{name} [{tag}]")
        row["bf16_clouds_s"] = round(B / row["bf16"] * 1000.0)
        rows.append(row)

    print("\n| Model | f32 ms/batch | bf16 ms/batch | bf16 clouds/s |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['model']} | {r['f32']:.2f} | {r['bf16']:.2f} "
            f"| {r['bf16_clouds_s']:,} |"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
