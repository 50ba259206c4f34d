#!/usr/bin/env python
"""On-chip verification of the manual two-reduce argmax in fps_kernel.py:
exact index parity vs the lax reference (including tie-heavy clouds built
from duplicated points — the dataset's repeat-padding makes exact distance
ties real), then production timings under chipbench."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scanobjectnn_tpu.ops.fps import farthest_point_sample_lax
from scanobjectnn_tpu.ops.pallas.fps_kernel import (
    fps_pallas,
    fps_pallas_with_coords,
)
from scanobjectnn_tpu.utils.chipbench import timed_ms

rng = np.random.RandomState(0)

# Tie-heavy cloud: 512 unique points each repeated 4x -> massive exact
# distance ties; first-occurrence rule decides every selection.
uniq = rng.randn(8, 512, 3).astype(np.float32)
tied = jnp.asarray(np.tile(uniq, (1, 4, 1)))
plain = jnp.asarray(rng.randn(8, 2048, 3).astype(np.float32))

ok = True
for name, pts, npoint in (
    ("plain", plain, 512),
    ("tied", tied, 512),
    ("plain-small", plain[:, :512], 128),
):
    ref = np.asarray(farthest_point_sample_lax(pts, npoint))
    got = np.asarray(fps_pallas(pts, npoint))
    same = np.array_equal(ref, got)
    idx2, coords = fps_pallas_with_coords(pts, npoint)
    same2 = np.array_equal(ref, np.asarray(idx2))
    gat = np.take_along_axis(
        np.asarray(pts), np.asarray(idx2)[..., None], axis=1
    )
    same3 = np.array_equal(gat, np.asarray(coords))
    print(f"parity[{name}]: idx={same} with_coords={same2} coords={same3}",
          flush=True)
    ok = ok and same and same2 and same3

print("--- production timings (chipbench two-point) ---", flush=True)
big = jnp.asarray(rng.randn(128, 2048, 3).astype(np.float32))


def f1(args):
    (p,) = args
    _, c = fps_pallas_with_coords(p, 512)
    return c.astype(jnp.float32).sum()[None]


def f2(args):
    (p,) = args
    _, c = fps_pallas_with_coords(p, 128)
    return c.astype(jnp.float32).sum()[None]


timed_ms(f1, (big,), lo=20, hi=100, name="fps_with_coords B128 2048->512")
timed_ms(f2, (big[:, :512],), lo=20, hi=100,
         name="fps_with_coords B128 512->128")
print(f"PARITY_OK={ok}", flush=True)
