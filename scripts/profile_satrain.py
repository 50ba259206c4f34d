#!/usr/bin/env python
"""Measure the fused SA TRAINING path (grouped_bn_mlp_pool custom VJP,
ops/pallas/satrain_kernel.py) against the unfused XLA-AD path on the real
chip, at the BENCHMARKS.md train-step configs (B16, N1024, loss+grad).

Round-3 VERDICT item 1 targets: MSG f32 <= ~22 ms, SSG f32 <= ~7 ms.

Methodology matches bench.py: serial lax.fori_loop chain inside ONE jit,
synced by a host scalar readback (block_until_ready is NOT a barrier on this
image's tunneled TPU); best of 3.

Usage: python scripts/profile_satrain.py [ssg|msg|bga|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from scanobjectnn_tpu.utils.chipbench import timed_ms

B, N = 16, 1024
def timed(name, f, *args):
    """f(*args) -> scalar-summable output; returns steady-state SECONDS."""
    return timed_ms(f, *args, lo=20, hi=100, name=name) / 1e3


def main():
    from scanobjectnn_tpu import models as zoo

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = {
        "ssg": ["pointnet2_cls_ssg"],
        "msg": ["pointnet2_cls_msg"],
        "bga": ["pointnet2_cls_bga"],
        "all": ["pointnet2_cls_ssg", "pointnet2_cls_msg", "pointnet2_cls_bga"],
    }[which]

    key = jax.random.PRNGKey(0)
    pts32 = jax.random.normal(key, (B, N, 3), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)
    masks = jnp.zeros((B, N), jnp.int32)

    for name in names:
        for dtype in ("float32", "bfloat16"):
            kw = {} if dtype == "float32" else {"dtype": jnp.bfloat16}
            model, _, _ = zoo.get_model(name, **kw)
            variables = model.init(
                {"params": key, "dropout": key}, pts32, train=True
            )
            params = variables["params"]
            stats = variables["batch_stats"]

            def fb(p):
                def loss(params_):
                    out, _ = model.apply(
                        {"params": params_, "batch_stats": stats},
                        p, train=True, bn_momentum=0.9,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=["batch_stats"],
                    )
                    l, _ = model.loss(
                        out, {"points": p, "labels": labels, "masks": masks}
                    )
                    return l

                l, g = jax.value_and_grad(loss)(params)
                return l + sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(g)
                )

            for fused in ("1", "0"):
                os.environ["SCANOBJECTNN_FUSED_SA_TRAIN"] = fused
                tag = "fused" if fused == "1" else "unfused"
                timed(f"{name} {dtype} loss+grad [{tag}]", fb, pts32)


if __name__ == "__main__":
    main()
