"""Visual check of FP inverse-distance interpolation.

Behavioral reference: pointnet2/tf_ops/3d_interpolation/visu_interpolation.py —
interpolate per-point colors from 4 known anchors onto 100 random query points
via three_nn + IDW three_interpolate, and render (a) the anchors, (b) the
interpolated queries, (c) both together.  Headless here: frames are rendered
with the native ball splatter (viz.show3d.render_frame) and written as PNGs
instead of the cv2 event loop.

Run: ``python -m scanobjectnn_tpu.viz.interp_check [out_dir]``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["interpolated_colors", "main"]


def interpolated_colors(
    xyz1: np.ndarray, xyz2: np.ndarray, colors2: np.ndarray
) -> np.ndarray:
    """IDW-interpolate per-point colors from known points xyz2 onto queries
    xyz1 (the reference's ``fun``, including the 1e-10 distance clamp)."""
    import jax.numpy as jnp

    from scanobjectnn_tpu.ops import interpolate as interp

    dist, idx = interp.three_nn(
        jnp.asarray(xyz1[None], jnp.float32), jnp.asarray(xyz2[None], jnp.float32)
    )
    weight = interp.three_interpolate_weights(dist)
    out = interp.three_interpolate(jnp.asarray(colors2[None], jnp.float32), idx, weight)
    return np.asarray(out[0])


def main(out_dir: str = ".", seed: int = 0) -> list[str]:
    import os

    from scanobjectnn_tpu.viz.show3d import render_frame

    rng = np.random.RandomState(seed)
    colors2 = np.array(
        [[0, 0, 1], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    xyz1 = rng.random_sample((100, 3)).astype(np.float32)
    xyz2 = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32
    )
    colors1 = interpolated_colors(xyz1, xyz2, colors2)

    frames = {
        "interp_known.png": (xyz2, colors2),
        "interp_queries.png": (xyz1, colors1),
        "interp_all.png": (
            np.concatenate([xyz1, xyz2]), np.concatenate([colors1, colors2]),
        ),
    }
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, (pts, cols) in frames.items():
        img = render_frame(pts, cols, size=400, radius=8)
        path = os.path.join(out_dir, name)
        _write_png(path, img)
        paths.append(path)
    return paths


def _write_png(path: str, img: np.ndarray) -> None:
    from scanobjectnn_tpu.viz.render import save_image_rgb

    save_image_rgb(path, img)


if __name__ == "__main__":
    import sys

    for p in main(sys.argv[1] if len(sys.argv) > 1 else "."):
        print(f"wrote {p}")
