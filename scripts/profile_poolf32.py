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


def poolkey_parity():
    """On-chip bit-parity of the fused Pallas keys-mode forward
    (poolkey_kernel) vs the XLA chain, at an SA1-like shape — real Mosaic
    rounding, not interpret mode."""
    from scanobjectnn_tpu.ops import exactpool as ep

    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    x = jax.random.normal(ks[0], (16, 512, 32, 64), jnp.bfloat16)
    w = jax.random.normal(ks[1], (64, 128), jnp.float32) * 0.2
    b = jax.random.normal(ks[2], (128,), jnp.float32) * 0.1
    gamma = 1.0 + 0.2 * jax.random.normal(ks[3], (128,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[4], (128,), jnp.float32)

    def run(args):
        def lf(a):
            p, _, _ = ep.dense_bn_exactkey_pool(*a, 2)
            return jnp.sum(p.astype(jnp.float32) * p.astype(jnp.float32))

        p, m, v = jax.jit(
            lambda a: ep.dense_bn_exactkey_pool(*a, 2)
        )((x, w, b, gamma, beta))
        g = jax.jit(jax.grad(lf))((x, w, b, gamma, beta))
        return p, m, v, g

    os.environ["SCANOBJECTNN_POOLKEY"] = "0"
    p0, m0, v0, g0 = run((x, w, b, gamma, beta))
    os.environ["SCANOBJECTNN_POOLKEY"] = "1"
    p1, m1, v1, g1 = run((x, w, b, gamma, beta))
    os.environ.pop("SCANOBJECTNN_POOLKEY", None)
    import numpy as np

    pa, pb = np.asarray(p0, np.float32), np.asarray(p1, np.float32)
    ok_p = np.array_equal(pa, pb)
    ndiff = int(np.sum(pa != pb))
    maxd = float(np.max(np.abs(pa - pb))) if ndiff else 0.0
    ok_s = np.array_equal(np.asarray(m0), np.asarray(m1)) and np.array_equal(
        np.asarray(v0), np.asarray(v1)
    )
    ok_g = all(
        np.array_equal(np.asarray(a, np.float32), np.asarray(c, np.float32))
        for a, c in zip(g0, g1)
    )
    print(
        f"POOLKEY parity: pooled={ok_p} (ndiff={ndiff}/{pa.size}, "
        f"maxdiff={maxd:.3e}) stats={ok_s} grads={ok_g}",
        flush=True,
    )


def main():
    from scanobjectnn_tpu import models as zoo

    os.environ["SCANOBJECTNN_FUSED_SA_TRAIN"] = "0"
    poolkey_parity()
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

            def fwd(p):
                # forward-only (train mode) — consume loss AND the mutated
                # batch_stats so nothing is dead-code-eliminated.
                out, mut = model.apply(
                    {"params": params, "batch_stats": stats},
                    p, train=True, bn_momentum=0.9,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"],
                )
                l, _ = model.loss(out, {"points": p, "labels": lab})
                pins = sum(
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(mut)
                )
                return l + pins * jnp.float32(1e-20)

            for flag in flags:
                os.environ["SCANOBJECTNN_SA_POOL_F32"] = flag
                tag = dtype if flag == "0" else f"{dtype} +pool:{flag}"
                timed(f"ssg B{b} N{n} loss+grad [{tag}]", fb, pts32)
                if (b, n) == (16, 1024) and flag in ("0", "keys"):
                    timed(f"ssg B{b} N{n} fwd-only  [{tag}]", fwd, pts32)


if __name__ == "__main__":
    main()
