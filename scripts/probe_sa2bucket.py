"""On-chip probe for the has_src (SA2) spatially-bucketed fused SA kernel.

SA2 is the one headline term measured ABOVE its own MXU floor (2.9x,
BENCHMARKS.md decomposition): 64 small [128,512]@[512,16] slot matmuls per
program are issue-bound.  The bucketed has_src path halves the contraction
width AND folds the feature gather into the same payload (stacked-chunk
extraction) — this probe measures whether that wins at the headline SA2
shapes (B=128, N=512 candidates with C=128 features, M=128 FPS queries,
K=64, mlp (128,128,256), bf16), plus on-chip parity and the full-model
effect via a temporary auto-table entry.

Run ONE AT A TIME on the chip: python scripts/probe_sa2bucket.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.ops.pallas import sabucket_kernel
from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
from scanobjectnn_tpu.utils.chipbench import timed_ms
from scripts.probe_sabucket import gate_stats

B, N, M, K = 128, 512, 128, 64
C = 128
FEATS = (128, 128, 256)
RADIUS = 0.4


def make_weights(rng):
    ws = [jnp.asarray(rng.normal(size=(3 + C, FEATS[0])).astype(np.float32) * 0.1)]
    bs = [jnp.asarray(rng.normal(size=(FEATS[0],)).astype(np.float32) * 0.1)]
    for a, c in zip(FEATS[:-1], FEATS[1:]):
        ws.append(jnp.asarray(rng.normal(size=(a, c)).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1))
    return ws, bs


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    # SA2's candidates are SA1's FPS centroids of a gaussian cloud — use the
    # real distribution, not a fresh gaussian.
    cloud = jax.random.normal(key, (B, 2048, 3), jnp.float32)
    _, xyz = ops.farthest_point_sample_with_coords(cloud, N)
    _, q = ops.farthest_point_sample_with_coords(xyz, M)
    xyz, q = jax.block_until_ready(xyz), jax.block_until_ready(q)
    src = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    ws, bs = make_weights(rng)

    def f(args):
        pts, qq, s = args
        out, _ = sa_ball_mlp_pool(
            RADIUS, K, pts, qq, s, ws, bs, dtype=jnp.bfloat16,
            need_idx=False,
        )
        return out.astype(jnp.float32)

    print("--- bucketed SA2 configs (bench FPS-centroid clouds) ---",
          flush=True)
    os.environ["SCANOBJECTNN_SA_BUCKET"] = "0"
    timed_ms(f, (xyz, q, src), name="full fused SA2 (baseline)")
    for cfg in ("256,32,128", "384,32,128", "384,64,128"):
        wlen, qtile, gblk = (int(v) for v in cfg.split(","))
        ov, need = gate_stats(
            np.asarray(xyz), np.asarray(q), RADIUS, wlen, qtile, gblk
        )
        os.environ["SCANOBJECTNN_SA_BUCKET"] = cfg
        timed_ms(
            f, (xyz, q, src),
            name=f"bucketed W={wlen} T={qtile} (ov={ov} need={need})",
        )

    # --- on-chip parity (has_src, compiled, small B) ---
    print("--- on-chip parity (has_src) ---", flush=True)
    bp = 8
    gsrc = jnp.asarray(rng.normal(size=(bp, N, C)).astype(np.float32))
    fixtures = {
        "sparse": jnp.asarray(
            rng.normal(size=(bp, N, 3)).astype(np.float32)
        ),
    }
    centers = rng.normal(size=(bp, 12, 3)) * np.array([4.0, 0.3, 0.3])
    assign = rng.integers(0, 12, size=(bp, N))
    fixtures["dense"] = jnp.asarray(
        (centers[np.arange(bp)[:, None], assign]
         + rng.normal(size=(bp, N, 3)) * 0.05).astype(np.float32)
    )
    ok = True
    for label, pts in fixtures.items():
        qq = pts[:, :M, :]
        os.environ["SCANOBJECTNN_SA_BUCKET"] = "0"
        ref, _ = sa_ball_mlp_pool(
            RADIUS, K, pts, qq, gsrc, ws, bs, dtype=jnp.bfloat16,
            need_idx=False,
        )
        os.environ["SCANOBJECTNN_SA_BUCKET"] = "256,32,128"
        out, _ = sa_ball_mlp_pool(
            RADIUS, K, pts, qq, gsrc, ws, bs, dtype=jnp.bfloat16,
            need_idx=False,
        )
        same = bool(jnp.all(out == ref))
        ok = ok and same
        print(f"parity[{label}]: bitexact={same}", flush=True)

    # --- end-to-end headline forward with a temporary (N=512,M=128) entry ---
    print("--- SSG eval forward B=128 N=2048 bf16 ---", flush=True)
    from scanobjectnn_tpu import models as zoo

    model, _, _ = zoo.get_model("pointnet2_cls_ssg", dtype=jnp.bfloat16)
    variables = model.init({"params": key, "dropout": key}, cloud, train=False)

    def fwd(args):
        (pts,) = args
        return model.apply(variables, pts, train=False)["logits"].astype(
            jnp.float32
        )

    os.environ["SCANOBJECTNN_SA_BUCKET"] = "auto"
    timed_ms(fwd, (cloud,), name="model fwd, auto (SA1 entry only)")
    for sa2cfg in ((256, 32, 128), (384, 32, 128)):
        sabucket_kernel._AUTO_BUCKET[(512, 128)] = sa2cfg
        # new entry -> new jit cache key is NOT automatic (env unchanged);
        # clear the jit caches so dispatch re-evaluates.
        jax.clear_caches()
        timed_ms(fwd, (cloud,), name=f"model fwd, auto + SA2 {sa2cfg}")
    del sabucket_kernel._AUTO_BUCKET[(512, 128)]
    print(f"PARITY_OK={ok}", flush=True)


if __name__ == "__main__":
    main()
