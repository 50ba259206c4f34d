"""On-chip probe for the spatially-bucketed fused SA1 kernel.

Measures, at the headline bench shapes (B=128, N=2048, M=512 real FPS
centroids, K=32, feats (64,64,128), bf16 folded weights):

  * the full-width fused SA1 (safused_kernel, bucket disabled) — baseline,
  * the bucketed kernel at several (W, T) configs (prints whether each
    config actually engages on the bench's gaussian clouds or trips the
    overflow gate — a tripped config times fallback + prep, not the win),
  * the end-to-end SSG eval forward (the headline program) bucket on/off,
  * on-chip bit-parity of the pooled output in all three runtime regimes.

Run ONE AT A TIME on the chip (CLAUDE.md): `python scripts/probe_sabucket.py`.
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
from scanobjectnn_tpu.utils.chipbench import timed_ms

B, N, M, K = 128, 2048, 512, 32
FEATS = (64, 64, 128)
RADIUS = 0.2


def gate_stats(xyz, q, radius, wlen, qtile, gblk):
    """Host-side replica of the wrapper's overflow gate + density stat."""
    xyz = np.asarray(xyz)
    q = np.asarray(q)
    b, n, _ = xyz.shape
    m = q.shape[1]
    ext = xyz.max(1) - xyz.min(1)
    ov = False
    need = 0
    for i in range(b):
        ax = int(np.argmax(ext[i]))
        key = np.sort(xyz[i, :, ax])
        qk = np.sort(q[i, :, ax])
        pad = radius * (1 + 1e-5) + 1e-6
        for t in range(m // qtile):
            lo, hi = qk[t * qtile] - pad, qk[(t + 1) * qtile - 1] + pad
            s = np.searchsorted(key, lo, "left")
            e = np.searchsorted(key, hi, "right")
            c0 = min(s // gblk, n // gblk - wlen // gblk)
            need = max(need, e - c0 * gblk)
            ov = ov or (e - c0 * gblk > wlen)
    return ov, need


def make_weights(rng):
    ws = [jnp.asarray(rng.normal(size=(3, FEATS[0])).astype(np.float32) * 0.1)]
    bs = [jnp.asarray(rng.normal(size=(FEATS[0],)).astype(np.float32) * 0.1)]
    for a, c in zip(FEATS[:-1], FEATS[1:]):
        ws.append(jnp.asarray(rng.normal(size=(a, c)).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1))
    return ws, bs


def layer_fn(ws, bs):
    def f(args):
        xyz, q = args
        out, _ = sa_ball_mlp_pool(
            RADIUS, K, xyz, q, None, ws, bs, dtype=jnp.bfloat16,
            need_idx=False,
        )
        return out.astype(jnp.float32)

    return f


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, N, 3), jnp.float32)
    _, q = ops.farthest_point_sample_with_coords(xyz, M)
    q = jax.block_until_ready(q)
    ws, bs = make_weights(rng)
    f = layer_fn(ws, bs)

    print("--- bucketed SA1 configs (bench clouds) ---", flush=True)
    os.environ["SCANOBJECTNN_SA_BUCKET"] = "0"
    timed_ms(f, (xyz, q), name="full fused SA1 (baseline)")
    for cfg in ("896,64,128", "768,64,128", "640,32,128", "768,32,128"):
        wlen, qtile, gblk = (int(v) for v in cfg.split(","))
        ov, need = gate_stats(xyz, q, RADIUS, wlen, qtile, gblk)
        os.environ["SCANOBJECTNN_SA_BUCKET"] = cfg
        timed_ms(
            f, (xyz, q),
            name=f"bucketed W={wlen} T={qtile} (ov={ov} need={need})",
        )

    # --- prep-chain decomposition (round 5: rank-sort kernel prep) ---
    print("--- prep decomposition ---", flush=True)
    from scanobjectnn_tpu.ops.pallas.onehot import flat_gather
    from scanobjectnn_tpu.ops.pallas.ranksort_kernel import rank_sort_points

    def prep_points(args):
        (pts,) = args
        key = pts[:, :, 0]
        planes_s, split_s, _, _ = rank_sort_points(
            key, jnp.transpose(pts, (0, 2, 1)), None, True, False, False
        )
        return planes_s[:, :3, :].astype(jnp.float32), split_s.astype(
            jnp.float32
        )

    def prep_queries(args):
        (qq,) = args
        qkey = qq[:, :, 0]
        q_planes_s, _, _, inv_q = rank_sort_points(
            qkey, jnp.transpose(qq, (0, 2, 1)), None, False, True, False
        )
        return q_planes_s[:, :3, :].astype(jnp.float32), inv_q

    timed_ms(prep_points, (xyz,), name="rank_sort N=2048 (planes+split)")
    timed_ms(prep_queries, (q,), name="rank_sort M=512 (planes+rank)")
    pooled_fake = jnp.asarray(
        rng.normal(size=(B, M, FEATS[-1])).astype(np.float32)
    ).astype(jnp.bfloat16)
    inv_fake = jnp.asarray(
        np.stack([rng.permutation(M) for _ in range(B)]).astype(np.int32)
    )

    def ungather(args):
        pooled, inv = args
        return flat_gather(pooled, inv, False).astype(jnp.float32)

    timed_ms(
        ungather, (pooled_fake, inv_fake),
        name="un-permute flat_gather [B,512,128] bf16",
    )

    def xla_argsort_prep(args):
        """The ROUND-4 prep chain, for the before/after record."""
        (pts,) = args
        from scanobjectnn_tpu.ops.grouping import batched_index_gather
        from scanobjectnn_tpu.ops.pallas.sabucket_kernel import (
            _split_with_ids,
        )

        key = pts[:, :, 0]
        order = jnp.argsort(key, axis=1)
        key_s = jnp.take_along_axis(key, order, axis=1)
        xyz_s = batched_index_gather(pts, order)
        split_s = _split_with_ids(xyz_s, order)
        return key_s, jnp.transpose(xyz_s, (0, 2, 1)), split_s.astype(
            jnp.float32
        )

    timed_ms(
        xla_argsort_prep, (xyz,),
        name="round-4 XLA prep N=2048 (argsort+gathers)",
    )

    # --- on-chip parity, all three regimes (compiled, small B) ---
    print("--- on-chip parity ---", flush=True)
    bp, npts, mq = 8, 1536, 512
    fixtures = {}
    g = jnp.asarray(rng.normal(size=(bp, npts, 3)).astype(np.float32))
    fixtures["sparse"] = g
    centers = rng.normal(size=(bp, 24, 3)) * np.array([4.0, 0.3, 0.3])
    assign = rng.integers(0, 24, size=(bp, npts))
    fixtures["dense"] = jnp.asarray(
        (centers[np.arange(bp)[:, None], assign]
         + rng.normal(size=(bp, npts, 3)) * 0.05).astype(np.float32)
    )
    fixtures["overflow"] = jnp.asarray(
        (rng.normal(size=(bp, npts, 3)) * 0.05).astype(np.float32)
    )
    ok = True
    for label, pts in fixtures.items():
        qq = pts[:, :mq, :]
        os.environ["SCANOBJECTNN_SA_BUCKET"] = "0"
        ref, _ = sa_ball_mlp_pool(
            RADIUS, K, pts, qq, None, ws, bs, dtype=jnp.bfloat16,
            need_idx=False,
        )
        os.environ["SCANOBJECTNN_SA_BUCKET"] = "768,64,128"
        out, _ = sa_ball_mlp_pool(
            RADIUS, K, pts, qq, None, ws, bs, dtype=jnp.bfloat16,
            need_idx=False,
        )
        same = bool(jnp.all(out == ref))
        ok = ok and same
        print(f"parity[{label}]: bitexact={same}", flush=True)

    # --- end-to-end headline forward ---
    print("--- SSG eval forward B=128 N=2048 bf16 ---", flush=True)
    from scanobjectnn_tpu import models as zoo

    model, _, _ = zoo.get_model("pointnet2_cls_ssg", dtype=jnp.bfloat16)
    variables = model.init(
        {"params": key, "dropout": key}, xyz, train=False
    )

    def fwd(args):
        (pts,) = args
        return model.apply(variables, pts, train=False)["logits"].astype(
            jnp.float32
        )

    os.environ["SCANOBJECTNN_SA_BUCKET"] = "0"
    base = timed_ms(fwd, (xyz,), name="model fwd, bucket off")
    for cfg in ("1152,128,128", "896,64,128"):
        os.environ["SCANOBJECTNN_SA_BUCKET"] = cfg
        timed_ms(fwd, (xyz,), name=f"model fwd, bucket {cfg}")
    print(f"PARITY_OK={ok}", flush=True)


if __name__ == "__main__":
    main()
