#!/usr/bin/env python
"""Layer-level decomposition of the fused-vs-unfused SA TRAINING gap
(follow-up to profile_satrain.py, which measured the fused custom-VJP path
NET SLOWER at the model level).  Times one GroupMLPPool fwd+bwd per SA
layer shape, under three backends:

  * fused + Pallas multi-pass backward  (SCANOBJECTNN_FUSED_SA_TRAIN=1)
  * fused + XLA recompute backward      (… + SCANOBJECTNN_SATRAIN_PALLAS=0)
  * unfused XLA AD                      (SCANOBJECTNN_FUSED_SA_TRAIN=0)

Usage: python scripts/profile_satrain_layers.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from scanobjectnn_tpu.utils.chipbench import timed_ms

def timed(name, f, *args):
    """f(*args) -> scalar-summable output; returns steady-state MS."""
    return timed_ms(f, *args, lo=20, hi=100, name=name)


# SA layer shapes at the BENCHMARKS.md train configs.
# (tag, B, M, K, C_in, feats)
SHAPES = [
    ("SSG-SA1 B16", 16, 512, 32, 3 + 0, (64, 64, 128)),
    ("SSG-SA2 B16", 16, 128, 64, 128 + 3, (128, 128, 256)),
    ("SSG-SA3 B16 (group_all M1K128)", 16, 1, 128, 256 + 3, (256, 512, 1024)),
    ("MSG-SA1s3 B16 K128", 16, 512, 128, 3, (64, 96, 128)),
]


def main():
    from scanobjectnn_tpu.nn.pointnet_modules import GroupMLPPool

    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"=== dtype {dtype.__name__} ===")
        for tag, b, m, k, cin, feats in SHAPES:
            x32 = jax.random.normal(key, (b, m, k, cin), jnp.float32)
            x = x32.astype(dtype)
            mdl = GroupMLPPool(feats, dtype=None if dtype == jnp.float32 else dtype)
            os.environ["SCANOBJECTNN_FUSED_SA_TRAIN"] = "0"
            variables = mdl.init(jax.random.PRNGKey(1), x, train=True)
            cot = jax.random.normal(jax.random.PRNGKey(2), (b, m, feats[-1]))

            def fb(xx):
                def loss(params):
                    out, _ = mdl.apply(
                        {"params": params,
                         "batch_stats": variables["batch_stats"]},
                        xx, train=True, mutable=["batch_stats"],
                    )
                    return jnp.sum(out.astype(jnp.float32) * cot)

                l, g = jax.value_and_grad(loss)(variables["params"])
                return l + sum(jnp.sum(v) for v in jax.tree.leaves(g))

            for env, tag2 in (
                ({"SCANOBJECTNN_FUSED_SA_TRAIN": "1",
                  "SCANOBJECTNN_SATRAIN_PALLAS": "1"}, "fused+pallas"),
                ({"SCANOBJECTNN_FUSED_SA_TRAIN": "1",
                  "SCANOBJECTNN_SATRAIN_PALLAS": "0"}, "fused+xla-recompute"),
                ({"SCANOBJECTNN_FUSED_SA_TRAIN": "0"}, "unfused"),
            ):
                os.environ.update(env)
                timed(f"{tag} {dtype.__name__} [{tag2}]", fb, x)


if __name__ == "__main__":
    main()
