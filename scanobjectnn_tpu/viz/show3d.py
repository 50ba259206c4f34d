"""Interactive point-cloud viewer.

Behavioral reference: pointnet2/utils/show3d_balls.py (ctypes z-buffer ball
splatting + cv2 event loop with rotation/zoom keys).  The splat kernel is the
native C++ renderer (native/render_balls.cpp); cv2 is optional — without it,
``showpoints`` falls back to returning/saving a single rendered frame.
"""

from __future__ import annotations

import numpy as np

from scanobjectnn_tpu.native import render_ball

__all__ = ["render_frame", "showpoints"]


def render_frame(
    points: np.ndarray,
    colors: np.ndarray | None = None,
    size: int = 800,
    radius: int = 5,
    zoom: float = 1.0,
    rot_x: float = 0.0,
    rot_y: float = 0.0,
    background: tuple[int, int, int] = (0, 0, 0),
    normalize: bool = True,
) -> np.ndarray:
    """Render one frame of the cloud into an [size, size, 3] uint8 image."""
    pts = np.asarray(points, np.float64).copy()
    if normalize:
        pts -= pts.mean(axis=0)
        scale = np.abs(pts).max()
        if scale > 0:
            pts /= scale * 2.2

    cx, sx = np.cos(rot_x), np.sin(rot_x)
    cy, sy = np.cos(rot_y), np.sin(rot_y)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    pts = pts @ (rx @ ry).T

    screen = np.empty((len(pts), 3), np.int32)
    screen[:, 0] = (pts[:, 1] * zoom * size * 0.8 + size / 2).astype(np.int32)
    screen[:, 1] = (pts[:, 0] * zoom * size * 0.8 + size / 2).astype(np.int32)
    screen[:, 2] = (pts[:, 2] * zoom * size * 0.8).astype(np.int32)

    if colors is None:
        colors = np.ones((len(pts), 3), np.float32)
    img = render_ball(size, size, screen, np.asarray(colors, np.float32), radius)
    if any(background):
        bg = (img.sum(axis=-1) == 0)
        img[bg] = np.asarray(background, np.uint8)
    return img


def showpoints(
    points: np.ndarray,
    colors: np.ndarray | None = None,
    output_path: str | None = None,
    interactive: bool = True,
    **kwargs,
) -> np.ndarray:
    """Show (cv2 window, if available and interactive) or save one frame.

    Keys in the interactive loop mirror the reference viewer: q quits,
    n/m zoom, arrows via a/d/w/s rotate.
    """
    try:
        import cv2  # type: ignore
    except ImportError:
        cv2 = None

    if cv2 is None or not interactive:
        img = render_frame(points, colors, **kwargs)
        if output_path:
            from scanobjectnn_tpu.viz.render import save_image

            save_image(output_path, img[..., 0] / 255.0)
        return img

    state = {"zoom": 1.0, "rx": 0.0, "ry": 0.0}
    while True:
        img = render_frame(
            points, colors,
            zoom=state["zoom"], rot_x=state["rx"], rot_y=state["ry"], **kwargs,
        )
        cv2.imshow("scanobjectnn_tpu", img)
        key = cv2.waitKey(10) & 0xFF
        if key == ord("q"):
            break
        elif key == ord("n"):
            state["zoom"] *= 1.1
        elif key == ord("m"):
            state["zoom"] /= 1.1
        elif key == ord("a"):
            state["ry"] += 0.1
        elif key == ord("d"):
            state["ry"] -= 0.1
        elif key == ord("w"):
            state["rx"] += 0.1
        elif key == ord("s"):
            state["rx"] -= 0.1
    cv2.destroyAllWindows()
    return img
