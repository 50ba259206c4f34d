#!/usr/bin/env python
"""A/B the stacked slot extraction (SCANOBJECTNN_SA_STACKED) against the
per-slot production path, on-chip, at the headline bench shapes.

The stacked form issues ONE [kc*T, N] one-hot matmul per kc-slot chunk
(built by a broadcast compare — no sublane concat copies, the cost that
sank the round-3 stacked-8 variant) instead of kc small [T, N] matmuls.
Same MXU tile-steps; the hypothesis is that SA2's 2.9x-over-floor
extraction term (BENCHMARKS.md per-term table: 64 four-step matmuls per
program) is per-matmul issue overhead that stacking amortizes.

Measures, for stacked in (0, 1):
  * SA1 fused layer (N=2048 M=512 K=32, xyz-only, feats 64,64,128)
  * SA2 fused layer (N=512 M=128 K=64, src C=128, feats 128,128,256)
  * the full headline forward (model zoo pointnet2_cls_ssg eval fwd)

Usage: python scripts/ab_stacked_extraction.py [sa|model|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scanobjectnn_tpu.utils.chipbench import timed_ms

B = 128


def _weights(key, shapes):
    ws, bs = [], []
    for i, (a, b) in enumerate(shapes):
        key = jax.random.fold_in(key, i)
        ws.append(jax.random.normal(key, (a, b), jnp.float32) * 0.1)
        bs.append(jnp.zeros((b,), jnp.float32))
    return ws, bs


def ab_sa_layers():
    from scanobjectnn_tpu import ops
    from scanobjectnn_tpu.ops.pallas import safused_kernel as SK

    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (B, 2048, 3), jnp.float32)
    _, new1 = ops.farthest_point_sample_with_coords(pts, 512)
    new1 = jax.block_until_ready(new1)
    feats1 = jax.random.normal(key, (B, 512, 128), jnp.float32)
    _, new2 = ops.farthest_point_sample_with_coords(new1, 128)
    new2 = jax.block_until_ready(new2)

    w1, b1 = _weights(key, [(3, 64), (64, 64), (64, 128)])
    w2, b2 = _weights(key, [(131, 128), (128, 128), (128, 256)])

    outs = {}
    for stacked in ("0", "1"):
        os.environ["SCANOBJECTNN_SA_STACKED"] = stacked
        tag = "stacked" if stacked == "1" else "per-slot"

        def sa1(a):
            f, i = SK.sa_ball_mlp_pool(0.2, 32, a[0], a[1], None, w1, b1,
                                       dtype=jnp.bfloat16)
            return (jnp.sum(f.astype(jnp.float32))
                    + jnp.sum(i.astype(jnp.float32)) * 1e-9)[None]

        def sa2(a):
            f, i = SK.sa_ball_mlp_pool(0.4, 64, a[0], a[1], a[2], w2, b2,
                                       dtype=jnp.bfloat16)
            return (jnp.sum(f.astype(jnp.float32))
                    + jnp.sum(i.astype(jnp.float32)) * 1e-9)[None]

        outs[f"sa1_{tag}"] = timed_ms(sa1, (pts, new1), name=f"SA1 [{tag}]")
        outs[f"sa2_{tag}"] = timed_ms(sa2, (new1, new2, feats1),
                                      name=f"SA2 [{tag}]")

    # Value parity ON CHIP (bit-exact contract).
    os.environ["SCANOBJECTNN_SA_STACKED"] = "0"
    f0, i0 = SK.sa_ball_mlp_pool(0.4, 64, new1, new2, feats1, w2, b2,
                                 dtype=jnp.bfloat16)
    os.environ["SCANOBJECTNN_SA_STACKED"] = "1"
    f1, i1 = SK.sa_ball_mlp_pool(0.4, 64, new1, new2, feats1, w2, b2,
                                 dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    print("on-chip SA2 bit parity: OK")
    return outs


def ab_model():
    from scanobjectnn_tpu import models as zoo

    key = jax.random.PRNGKey(0)
    points = jax.random.normal(key, (B, 2048, 3), jnp.float32)
    for stacked in ("0", "1"):
        os.environ["SCANOBJECTNN_SA_STACKED"] = stacked
        tag = "stacked" if stacked == "1" else "per-slot"
        model, _, _ = zoo.get_model("pointnet2_cls_ssg", dtype=jnp.bfloat16)
        variables = model.init({"params": key, "dropout": key}, points,
                               train=False)

        def fwd(pts):
            out = model.apply(variables, pts, train=False)
            return out["logits"].astype(jnp.float32)

        timed_ms(fwd, points, name=f"headline fwd B=128 [{tag}]")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("sa", "all"):
        ab_sa_layers()
    if which in ("model", "all"):
        ab_model()


if __name__ == "__main__":
    main()
