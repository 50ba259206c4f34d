#!/usr/bin/env python
"""Component-level timing of the DGCNN / SpiderCNN training steps on the real
chip, to direct kernel work at the measured bottleneck (VERDICT.md weak #4:
both must reach <=40 ms/step at B32/N1024).

Methodology matches bench.py (utils/chipbench.py): serial lax.fori_loop
chains inside ONE jit synced by a host scalar readback, timed at TWO
iteration counts so the fixed ~24-37 ms per-call dispatch cancels.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from scanobjectnn_tpu.utils.chipbench import timed_ms

B, N, K = 32, 1024, 20


def timed(name, f, *args):
    """f(*args) -> f32 scalar; returns steady-state SECONDS/iter."""
    return timed_ms(f, *args, lo=20, hi=100, name=name) / 1e3


def main():
    from scanobjectnn_tpu import models as zoo
    from scanobjectnn_tpu import ops
    from scanobjectnn_tpu.ops.pallas.edge_kernel import (
        edge_gather_knn,
        edge_reduce_pallas,
        gather_neighbors_pallas,
    )

    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, N, 3), jnp.float32)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    # ---------------------------------------------------------------- kernels
    if which in ("all", "kernels"):
        feats64 = jax.random.normal(key, (B, N, 64), jnp.float32)
        vals64 = jax.random.normal(jax.random.fold_in(key, 1), (B, N, 64), jnp.float32)

        timed("knn_graph C=64", lambda f: jnp.sum(ops.knn_graph(f, K).astype(jnp.float32)), feats64)
        timed(
            "edge_reduce fwd C=64",
            lambda f, v: sum(jnp.sum(edge_reduce_pallas(f, v, K)[n]) for n in ("mmax", "mmin", "s", "q2")),
            feats64, vals64,
        )

        def er_fb(v, f):
            def loss(v):
                r = edge_reduce_pallas(f, v, K)
                return jnp.sum(r["mmax"]) + jnp.sum(r["s"]) + jnp.sum(r["q2"]) + jnp.sum(r["mmin"])
            l, g = jax.value_and_grad(loss)(v)
            return l + jnp.sum(g)

        timed("edge_reduce fwd+bwd C=64", er_fb, vals64, feats64)

        idx = ops.knn_graph(pts, K)
        for c in (8, 32, 64, 128):
            v = jax.random.normal(jax.random.fold_in(key, c), (B, N, c), jnp.float32)
            timed(f"gather_neighbors fwd C={c}",
                  lambda v, i: jnp.sum(gather_neighbors_pallas(v, i)), v, idx)

            def g_fb(v, i):
                l, g = jax.value_and_grad(lambda v: jnp.sum(gather_neighbors_pallas(v, i) ** 2))(v)
                return l + jnp.sum(g)

            timed(f"gather_neighbors fwd+bwd C={c}", g_fb, v, idx)

        timed("edge_gather_knn fwd Cf=3pad8 Cv=64",
              lambda p, v: jnp.sum(edge_gather_knn(p, v, K)[0]), pts, vals64)

    # ------------------------------------------------------------- spiderconv
    if which in ("all", "spider"):
        from scanobjectnn_tpu.models.spidercnn import SpiderConv, taylor_basis, topk_pool

        idx = ops.knn_graph(pts, K)
        pts8 = jnp.pad(pts, ((0, 0), (0, 0), (0, 5)))
        delta = gather_neighbors_pallas(pts8, idx)[..., :3] - pts8[:, :, None, :3]

        for c_in, c_out in ((8, 32), (32, 64), (64, 128), (128, 256)):
            feat = jax.random.normal(jax.random.fold_in(key, c_out), (B, N, c_in), jnp.float32)
            layer = SpiderConv(c_out)
            params = layer.init(key, feat, idx, delta)

            timed(f"spiderconv fwd {c_in}->{c_out}",
                  lambda f, i, d: jnp.sum(layer.apply(params, f, i, d)), feat, idx, delta)

            def sc_fb(f, i, d):
                l, g = jax.value_and_grad(
                    lambda f: jnp.sum(layer.apply(params, f, i, d) ** 2)
                )(f)
                return l + jnp.sum(g)

            timed(f"spiderconv fwd+bwd(x) {c_in}->{c_out}", sc_fb, feat, idx, delta)

            def sc_fbw(f, i, d):
                l, g = jax.value_and_grad(
                    lambda p: jnp.sum(layer.apply(p, f, i, d) ** 2)
                )(params)
                return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

            timed(f"spiderconv fwd+bwd(params) {c_in}->{c_out}", sc_fbw, feat, idx, delta)

        feat480 = jax.random.normal(key, (B, N, 480), jnp.float32)
        timed("topk_pool fwd", lambda f: jnp.sum(topk_pool(f, 2)), feat480)

        def tp_fb(f):
            l, g = jax.value_and_grad(lambda f: jnp.sum(topk_pool(f, 2) ** 2))(f)
            return l + jnp.sum(g)

        timed("topk_pool fwd+bwd", tp_fb, feat480)

    # ------------------------------------------------------------ full models
    if which in ("all", "models"):
        for name in ("dgcnn", "spidercnn_cls_xyz"):
            model, _, _ = zoo.get_model(name)
            variables = model.init({"params": key, "dropout": key}, pts, train=False)
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            labels = jnp.zeros((B,), jnp.int32)

            def fwd(p):
                return jnp.sum(
                    model.apply({"params": params, "batch_stats": stats}, p, train=False)[
                        "logits"
                    ].astype(jnp.float32)
                )

            timed(f"{name} fwd (eval)", fwd, pts)

            def fb(p):
                def loss(params_):
                    out, _ = model.apply(
                        {"params": params_, "batch_stats": stats},
                        p, train=True, bn_momentum=0.9,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=["batch_stats"],
                    )
                    l, _ = model.loss(out, {"points": p, "labels": labels, "masks": jnp.zeros((B, N), jnp.int32)})
                    return l

                l, g = jax.value_and_grad(loss)(params)
                return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

            timed(f"{name} fwd+bwd (train loss+grad)", fb, pts)


if __name__ == "__main__":
    main()
