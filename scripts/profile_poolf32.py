#!/usr/bin/env python
"""A/B the pool_f32 mixed-precision mode (SCANOBJECTNN_SA_POOL_F32) on the
default UNFUSED bf16 training path: loss+grad step time with the flag off
vs on, at the synthetic-hard shape (B24 N512) and the BENCHMARKS train
shape (B16 N1024).

The flag's quality effect is measured by synthetic_hard_bench.py --pool_f32
(SYNTH_HARD.md); this script isolates its COST so the speed criterion
(>= ~80% of the bf16 speedup retained) is judged from step time, not from
compile-polluted epoch walls.

Usage: python scripts/profile_poolf32.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from scanobjectnn_tpu.utils.chipbench import timed_ms

def timed(name, f, *args):
    """f(*args) -> scalar-summable output; returns steady-state SECONDS."""
    return timed_ms(f, *args, lo=20, hi=100, name=name) / 1e3


def main():
    from scanobjectnn_tpu import models as zoo

    os.environ["SCANOBJECTNN_FUSED_SA_TRAIN"] = "0"
    key = jax.random.PRNGKey(0)
    labels = jnp.zeros((1,), jnp.int32)  # broadcast below per-B

    for b, n in ((24, 512), (16, 1024)):
        pts32 = jax.random.normal(key, (b, n, 3), jnp.float32)
        lab = jnp.zeros((b,), jnp.int32)
        for dtype, flags in (
            ("float32", ("0",)),
            ("bfloat16", ("0", "1", "keys")),
        ):
            kw = {} if dtype == "float32" else {"dtype": jnp.bfloat16}
            model, _, _ = zoo.get_model("pointnet2_cls_ssg", **kw)
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
                    l, _ = model.loss(out, {"points": p, "labels": lab})
                    return l

                l, g = jax.value_and_grad(loss)(params)
                return l + sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(g)
                )

            for flag in flags:
                os.environ["SCANOBJECTNN_SA_POOL_F32"] = flag
                tag = dtype if flag == "0" else f"{dtype} +pool:{flag}"
                timed(f"ssg B{b} N{n} loss+grad [{tag}]", fb, pts32)


if __name__ == "__main__":
    main()
