"""Synthetic dataset fixtures.

The reference has no test fixtures at all (SURVEY.md §4) — its integration test
is "run the benchmark".  We manufacture tiny, class-separable point-cloud
datasets in the exact h5 container layout so end-to-end training tests can
assert learning progress in seconds.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "make_synthetic_dataset",
    "make_hard_synthetic_dataset",
    "write_synthetic_h5",
]

_PROTOTYPES = {
    0: "sphere",
    1: "cube",
    2: "plane",
    3: "line",
    4: "two_clusters",
    5: "cylinder",
    6: "torus",
    7: "cone",
    8: "helix",
    9: "cross",
    10: "shell",
    11: "ellipsoid",
    12: "pyramid",
    13: "rings",
    14: "lattice",
}


def _sample_prototype(kind: str, n: int, rng: np.random.RandomState) -> np.ndarray:
    if kind == "sphere":
        v = rng.randn(n, 3)
        return v / np.linalg.norm(v, axis=1, keepdims=True)
    if kind == "cube":
        return rng.uniform(-1, 1, (n, 3))
    if kind == "plane":
        p = rng.uniform(-1, 1, (n, 3))
        p[:, 2] *= 0.05
        return p
    if kind == "line":
        t = rng.uniform(-1, 1, (n, 1))
        return np.concatenate([t, 0.1 * rng.randn(n, 2)], axis=1)
    if kind == "two_clusters":
        c = rng.randint(0, 2, n) * 2.0 - 1.0
        return 0.25 * rng.randn(n, 3) + np.stack([c, c, np.zeros(n)], axis=1) * 0.8
    if kind == "cylinder":
        theta = rng.uniform(0, 2 * np.pi, n)
        return np.stack([np.cos(theta), rng.uniform(-1, 1, n), np.sin(theta)], axis=1)
    if kind == "torus":
        u = rng.uniform(0, 2 * np.pi, n)
        v = rng.uniform(0, 2 * np.pi, n)
        r, R = 0.3, 0.7
        return np.stack(
            [(R + r * np.cos(v)) * np.cos(u), r * np.sin(v), (R + r * np.cos(v)) * np.sin(u)],
            axis=1,
        )
    if kind == "cone":
        h = rng.uniform(0, 1, n)
        theta = rng.uniform(0, 2 * np.pi, n)
        return np.stack(
            [(1 - h) * np.cos(theta), 2 * h - 1, (1 - h) * np.sin(theta)], axis=1
        )
    if kind == "helix":
        t = rng.uniform(-2 * np.pi, 2 * np.pi, n)
        return np.stack(
            [0.8 * np.cos(t), t / (2 * np.pi), 0.8 * np.sin(t)], axis=1
        ) + 0.03 * rng.randn(n, 3)
    if kind == "cross":
        axis = rng.randint(0, 3, n)
        p = 0.08 * rng.randn(n, 3)
        p[np.arange(n), axis] = rng.uniform(-1, 1, n)
        return p
    if kind == "shell":
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return v * rng.uniform(0.8, 1.0, (n, 1))
    if kind == "ellipsoid":
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return v * np.array([1.0, 0.4, 0.7])
    if kind == "pyramid":
        h = rng.uniform(0, 1, n)
        side = 1 - h
        return np.stack(
            [rng.uniform(-1, 1, n) * side, 2 * h - 1, rng.uniform(-1, 1, n) * side],
            axis=1,
        )
    if kind == "rings":
        which = rng.randint(0, 2, n)
        theta = rng.uniform(0, 2 * np.pi, n)
        y = np.where(which == 0, -0.6, 0.6)
        return np.stack([np.cos(theta), y, np.sin(theta)], axis=1) + 0.02 * rng.randn(n, 3)
    if kind == "lattice":
        g = rng.randint(0, 3, (n, 3)) - 1.0
        return g * 0.7 + 0.07 * rng.randn(n, 3)
    raise ValueError(kind)


def make_synthetic_dataset(
    num_per_class: int = 8,
    num_classes: int = 4,
    num_points: int = 128,
    seed: int = 0,
    with_mask: bool = False,
    with_parts: bool = False,
):
    """Class-separable clouds: ``(data[B,N,3], label[B][, mask][, parts])``.

    With ``with_mask``, ~25% of points are replaced by far-away "background"
    points with mask=-1 (foreground keeps its raw mask id >= 0), matching the
    h5 mask convention (-1 == background, training_data/README.md FAQ #5).
    """
    assert num_classes <= len(_PROTOTYPES)
    rng = np.random.RandomState(seed)
    data, labels, masks, parts = [], [], [], []
    for label in range(num_classes):
        for _ in range(num_per_class):
            pc = _sample_prototype(_PROTOTYPES[label], num_points, rng).astype(np.float32)
            mask = rng.randint(0, 3, num_points).astype(np.int64)
            part = rng.randint(0, 3, num_points).astype(np.int64)
            if with_mask:
                n_bg = num_points // 4
                bg_idx = rng.choice(num_points, n_bg, replace=False)
                pc[bg_idx] = rng.uniform(2.0, 3.0, (n_bg, 3)).astype(np.float32)
                mask[bg_idx] = -1
            data.append(pc)
            labels.append(label)
            masks.append(mask)
            parts.append(part)
    out = [np.stack(data), np.array(labels, dtype=np.int64)]
    if with_mask:
        out.append(np.stack(masks))
    if with_parts:
        out.append(np.stack(parts))
    return tuple(out)


def make_hard_synthetic_dataset(
    num_per_class: int = 50,
    num_classes: int = 6,
    num_points: int = 256,
    clutter_frac: float = 0.5,
    seed: int = 0,
    return_parts: bool = False,
):
    """A DISCRIMINATING benchmark: near-confusable classes drowned in
    background clutter — the regime the paper's BGA models exist for
    (background-aware joint cls+seg, pointnet2_cls_bga.py).

    The easy fixture's classes are trivially separable (every family hits
    1.000 — round-2 VERDICT: such checks cannot catch a model-quality
    regression).  Here:

      * classes are ellipsoids with distinct-but-confusable axis-ratio
        triples under per-sample ±10% anisotropic scale jitter — the class
        signal sits just above the jitter noise;
      * ``clutter_frac`` of each cloud is background with mask −1 (the h5
        convention): half a DISTRACTOR — a full ellipsoid of a *different*
        class, offset from the object like the neighboring-furniture
        attachments in real ScanObjectNN scans — and half uniform clutter
        in the enclosing ball.

    Uniform clutter alone proved insufficient: class-independent noise
    shifts pooled features by a constant that plain classifiers learn to
    subtract (round-3 probe: plain PN++ 0.66 vs BGA 0.62), and a
    hemisphere-cropped fragment only tied the PN++ pair (0.578 both).
    A full wrong-class ellipsoid puts TWO objects in the cloud — the label
    is defined by WHICH one is foreground, information only the mask
    supervision provides — so a pooled global feature is intrinsically
    ambiguous while a BGA trunk can learn to discount the off-center body
    (the paper's mechanism: pointnet2_cls_bga.py's class-vector-conditioned
    seg branch).  Returns (points[B,N,3] f32, labels[B] i64,
    masks[B,N] i64, −1 = bg); with ``return_parts`` also parts[B,N] i64
    (0 = foreground object, 1 = distractor body, 2 = uniform clutter).
    """
    # Axis-ratio prototypes: a 3x2 grid (axis-2 x axis-3) with gaps ~1.8 sigma
    # of the per-sample jitter — calibrated so plain-classifier accuracy
    # lands well below 1.0 and separates by family (the round-2 probe at
    # gaps ~0.15 / 6% jitter measured pointnet at 0.978: too easy).
    _PROTO_RATIOS = np.array([
        [1.00, 0.85, 0.65],
        [1.00, 0.85, 0.45],
        [1.00, 0.72, 0.65],
        [1.00, 0.72, 0.45],
        [1.00, 0.59, 0.65],
        [1.00, 0.59, 0.45],
        [1.00, 0.46, 0.65],
        [1.00, 0.46, 0.45],
    ])
    protos = [_PROTO_RATIOS[c % len(_PROTO_RATIOS)] for c in range(num_classes)]
    rng = np.random.RandomState(seed)
    n_clutter = int(round(num_points * clutter_frac))
    n_fg = num_points - n_clutter
    n_distract = n_clutter // 2
    n_uniform = n_clutter - n_distract
    data, labels, masks, parts = [], [], [], []

    def _ellipsoid(n, ratios):
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        jitter = 1.0 + 0.10 * rng.randn(3)
        return (v * ratios * jitter * 0.5).astype(np.float32)

    for label in range(num_classes):
        for _ in range(num_per_class):
            fg = _ellipsoid(n_fg, protos[label])
            # Distractor: a full ellipsoid of ANOTHER class, offset so the
            # foreground body stays the (approximately) central one.
            other = (label + rng.randint(1, num_classes)) % num_classes
            frag = _ellipsoid(n_distract, protos[other])
            offset = rng.randn(3)
            offset *= rng.uniform(0.70, 1.00) / np.linalg.norm(offset)
            frag = frag + offset.astype(np.float32)
            cl = rng.randn(n_uniform, 3)
            cl /= np.linalg.norm(cl, axis=1, keepdims=True)
            cl = (cl * rng.uniform(0.0, 1.0, (n_uniform, 1)) ** (1 / 3)).astype(
                np.float32
            )
            pc = np.concatenate([fg, frag, cl], axis=0)
            mask = np.concatenate(
                [np.zeros(n_fg, np.int64), -np.ones(n_clutter, np.int64)]
            )
            # Part ids: 0 = foreground object, 1 = distractor body,
            # 2 = uniform clutter.  Separating part 0 from part 1 (two
            # ellipsoids; which one is foreground) is the task's hard core —
            # a DISCRIMINATING per-point signal for the partseg rows.
            part = np.concatenate([
                np.zeros(n_fg, np.int64),
                np.ones(n_distract, np.int64),
                np.full(n_uniform, 2, np.int64),
            ])
            perm = rng.permutation(num_points)
            data.append(pc[perm])
            masks.append(mask[perm])
            parts.append(part[perm])
            labels.append(label)
    out = (
        np.stack(data),
        np.array(labels, dtype=np.int64),
        np.stack(masks),
    )
    if return_parts:
        out = out + (np.stack(parts),)
    return out


def write_synthetic_h5(path: str, **kwargs) -> None:
    from scanobjectnn_tpu.data import io

    arrays = make_synthetic_dataset(**kwargs)
    data, label = arrays[0], arrays[1]
    mask = arrays[2] if kwargs.get("with_mask") else None
    parts = arrays[-1] if kwargs.get("with_parts") else None
    io.save_h5(path, data, label, mask=mask, parts=parts)
