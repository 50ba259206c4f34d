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
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 20


def timed(name, f, *args, iters=ITERS):
    @jax.jit
    def chain(*a):
        def body(i, carry):
            a0, acc = carry
            out = f(a0, *a[1:]).astype(jnp.float32)
            return a0 * (1.0 + 1e-20 * out), acc + out

        a0, acc = lax.fori_loop(0, iters, body, (a[0], jnp.float32(0)))
        return acc + jnp.sum(a0).astype(jnp.float32) * 0e0

    float(chain(*args))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:58s} {best * 1e3:8.2f} ms", flush=True)
    return best


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
