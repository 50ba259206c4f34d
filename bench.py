#!/usr/bin/env python
"""Headline benchmark: PointNet++ SSG inference throughput at 2048 points on
one TPU chip (BASELINE.json north-star metric: clouds/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against an estimate of the TF1 reference stack:
the reference publishes no throughput numbers (BASELINE.md), so we use a
documented estimate of PointNet++ SSG inference in TF1.10/CUDA9 on the
contemporaneous single GPU at 2048 pts: ~125 clouds/s (the original
PointNet++ paper reports ~12ms/cloud fwd at 1024 pts on a GTX1080 ≈ 80-160
clouds/s batched; 2048 pts roughly halves it; we take 125).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CLOUDS_PER_SEC = 125.0  # documented estimate, see module docstring
BATCH = 32
NUM_POINT = 2048


def main() -> None:
    from scanobjectnn_tpu import models as zoo

    model, _, _ = zoo.get_model("pointnet2_cls_ssg", dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    points = jax.random.normal(key, (BATCH, NUM_POINT, 3), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, points, train=False)

    @jax.jit
    def forward(pts):
        return model.apply(variables, pts, train=False)["logits"]

    # Warmup / compile.
    forward(points).block_until_ready()

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(points)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    clouds_per_sec = BATCH * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "pointnet2_ssg_inference_2048pts",
                "value": round(clouds_per_sec, 1),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(clouds_per_sec / REFERENCE_CLOUDS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
