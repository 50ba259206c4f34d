#!/usr/bin/env python
"""Re-measure the BENCHMARKS.md decision-driving tables under the two-point
dispatch-free protocol (utils/chipbench.timed_ms) — round-4 VERDICT item 7:
the round-<=3 rows were measured as one 20-30-iteration chain divided by its
iteration count, which inflates every row by the fixed ~24-37 ms host
dispatch (~+0.9-1.4 ms/row).

Part A: full train steps (augment + fwd + loss + bwd + optimizer + BN stat
update — Trainer._train_step_impl, the program a training run actually
loops) for every family at its reference config, f32 and bf16; bf16 rows
are measured under BOTH pool_precision=native (the collapsing mode, for
speed comparability with old tables) and =keys (the quality-recovering
exact-key pool — the bf16 'auto' default), so the keys-mode speed retention
is a first-class number.

Part B: the kernel-level Pallas-vs-XLA rows.

Run ONE AT A TIME on the chip:  python scripts/remeasure_tables.py [A|B]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scanobjectnn_tpu.utils.chipbench import timed_ms


def time_train_step(name: str, batch_size: int, dtype: str, pool: str,
                    n: int = 1024, seg: bool = False, parts: bool = False):
    from scanobjectnn_tpu.train import Trainer, TrainerConfig

    cfg = TrainerConfig(
        model=name, num_classes=6 if parts else 15, num_point=n,
        batch_size=batch_size, dtype=dtype, pool_precision=pool,
        log_dir=None,
    )
    trainer = Trainer(cfg)
    state = trainer.init_state(0)
    rng = np.random.RandomState(0)
    batch = {
        "points": jnp.asarray(rng.randn(batch_size, n, 3), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 15, batch_size), jnp.int32),
    }
    if seg:
        batch["masks"] = jnp.asarray(
            rng.randint(0, 2, (batch_size, n)), jnp.int32
        )
    if parts:
        batch["labels"] = jnp.asarray(
            rng.randint(0, 6, batch_size), jnp.int32
        )
        batch["parts"] = jnp.asarray(
            rng.randint(0, 6, (batch_size, n)), jnp.int32
        )
    key = jax.random.PRNGKey(0)

    def step(b):
        new_state, metrics = trainer._train_step_impl(state, b, key)
        # The chained output MUST consume the whole updated state: returning
        # only the loss lets XLA dead-code-eliminate the backward, optimizer
        # and BN-stat updates (the loss depends on the forward alone), which
        # silently turns this into a forward-only timing.  Summing the new
        # params (each of which depends on its gradient through the adam
        # update) and batch_stats pins the full step in the program.
        pins = sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(
                (new_state.params, new_state.batch_stats)
            )
        )
        return metrics["loss"][None] + pins * jnp.float32(1e-20)

    tag = f"{name} B{batch_size} {dtype}" + (f" pool={pool}" if pool != "native" else "")
    return timed_ms(step, batch, lo=20, hi=100, name=tag)


def part_a():
    print("--- train steps (full step: augment+fwd+loss+bwd+opt+BN) ---",
          flush=True)
    rows = [
        ("pointnet2_cls_ssg", 16, False, False),
        ("pointnet2_cls_msg", 16, False, False),
        ("pointnet2_cls_bga", 16, True, False),
        ("pointnet_cls", 32, False, False),
        ("dgcnn", 32, False, False),
        ("dgcnn_bga", 32, True, False),
        ("spidercnn_cls_xyz", 32, False, False),
        ("pointcnn_cls", 32, False, False),
        ("3dmfv_net_cls", 64, False, False),
        ("pointnet2_cls_partseg", 8, False, True),
    ]
    results = {}
    for name, b, seg, parts in rows:
        results[(name, "f32")] = time_train_step(
            name, b, "float32", "native", seg=seg, parts=parts
        )
        results[(name, "bf16")] = time_train_step(
            name, b, "bfloat16", "native", seg=seg, parts=parts
        )
        if name in (
            "pointnet2_cls_ssg", "pointnet2_cls_msg", "pointnet_cls",
        ):
            keys_ms = time_train_step(
                name, b, "bfloat16", "keys", seg=seg, parts=parts
            )
            f32_ms, bf_ms = results[(name, "f32")], results[(name, "bf16")]
            if f32_ms > keys_ms and f32_ms > bf_ms:
                ret = (f32_ms - keys_ms) / max(f32_ms - bf_ms, 1e-9)
                print(f"    -> keys retention of bf16 speedup: {ret:.0%}",
                      flush=True)


def part_b():
    print("--- kernel-level Pallas vs XLA ---", flush=True)
    from scanobjectnn_tpu import ops
    from scanobjectnn_tpu.ops import fps as fps_mod

    key = jax.random.PRNGKey(0)

    def with_backend(backend, f, *args, name):
        os.environ["SCANOBJECTNN_OPS_BACKEND"] = backend
        try:
            return timed_ms(f, *args, lo=20, hi=100,
                            name=f"{name} [{backend}]")
        finally:
            os.environ.pop("SCANOBJECTNN_OPS_BACKEND", None)

    # FPS
    xyz = jax.random.normal(key, (32, 2048, 3), jnp.float32)

    def fps_fn(args):
        (p,) = args
        return ops.farthest_point_sample(p, 512).astype(jnp.float32).sum()[None]

    for backend in ("pallas", "lax"):
        with_backend(backend, fps_fn, (xyz,), name="fps B32 N2048->512")

    # query_ball_group at the two SA shapes
    for (b, n, m, k, r) in ((32, 2048, 512, 32, 0.2), (32, 512, 128, 64, 0.4)):
        pts = jax.random.normal(key, (b, n, 3), jnp.float32)
        q = pts[:, :m, :]

        def qbg_fn(args):
            p, qq = args
            g, idx, cnt = ops.query_ball_group(r, k, p, qq)
            return (g.astype(jnp.float32).sum()
                    + idx.astype(jnp.float32).sum())[None]

        for backend in ("pallas", "lax"):
            with_backend(
                backend, qbg_fn, (pts, q),
                name=f"query_ball_group B{b} N{n} M{m} K{k}",
            )

    # kNN graph (DGCNN) feature + coord shapes
    for (b, n, c) in ((32, 1024, 64), (32, 2048, 3)):
        feats = jax.random.normal(key, (b, n, c), jnp.float32)

        def knn_fn(args):
            (f,) = args
            _, idx = ops.knn_point(20, f, f)
            return idx.astype(jnp.float32).sum()[None]

        for backend in ("pallas", "lax"):
            with_backend(backend, knn_fn, (feats,),
                         name=f"knn k=20 B{b} N{n} C{c}")

    # edge_reduce fwd+bwd (the DGCNN engine)
    from scanobjectnn_tpu.ops.pallas.edge_kernel import edge_reduce

    feats = jax.random.normal(key, (32, 1024, 64), jnp.float32)

    def er_fb(args):
        (f,) = args

        def loss(ff):
            out = edge_reduce(ff, ff, 20)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in
                       jax.tree_util.tree_leaves(out))

        l, g = jax.value_and_grad(loss)(f)
        return (l + g.sum())[None]

    timed_ms(er_fb, (feats,), lo=20, hi=100,
             name="edge_reduce fwd+bwd B32 N1024 k20 C64")

    # fused SA layers vs two-kernel chain (bf16 eval shapes)
    from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
    from scanobjectnn_tpu.ops.pallas.samlp_kernel import sa_mlp_pool

    rng = np.random.default_rng(0)

    def mk_wb(feats_dims, c_in):
        ws = [jnp.asarray(rng.normal(size=(c_in, feats_dims[0])) * 0.1,
                          jnp.float32)]
        bs = [jnp.asarray(rng.normal(size=(feats_dims[0],)) * 0.1, jnp.float32)]
        for a, c in zip(feats_dims[:-1], feats_dims[1:]):
            ws.append(jnp.asarray(rng.normal(size=(a, c)) * 0.1, jnp.float32))
            bs.append(jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32))
        return ws, bs

    pts = jax.random.normal(key, (128, 2048, 3), jnp.float32)
    _, q1 = ops.farthest_point_sample_with_coords(pts, 512)
    ws1, bs1 = mk_wb((64, 64, 128), 3)

    def sa1_fused(args):
        p, qq = args
        out, _ = sa_ball_mlp_pool(0.2, 32, p, qq, None, ws1, bs1,
                                  dtype=jnp.bfloat16, need_idx=False)
        return out.astype(jnp.float32).sum()[None]

    def sa1_chain(args):
        p, qq = args
        g, idx, _ = ops.query_ball_group(0.2, 32, p, qq)
        out = sa_mlp_pool(g, None, None, ws1, bs1, dtype=jnp.bfloat16)
        return out.astype(jnp.float32).sum()[None]

    os.environ["SCANOBJECTNN_SA_BUCKET"] = "off"
    timed_ms(sa1_fused, (pts, q1), lo=20, hi=100,
             name="fused SA1 full-width B128 N2048 M512 K32 bf16")
    os.environ["SCANOBJECTNN_SA_BUCKET"] = "auto"
    timed_ms(sa1_fused, (pts, q1), lo=20, hi=100,
             name="fused SA1 bucketed(auto) same shapes")
    os.environ.pop("SCANOBJECTNN_SA_BUCKET", None)
    timed_ms(sa1_chain, (pts, q1), lo=20, hi=100,
             name="two-kernel SA1 chain same shapes")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "AB"
    if "A" in which:
        part_a()
    if "B" in which:
        part_b()
