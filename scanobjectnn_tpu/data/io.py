"""Dataset I/O for ScanObjectNN.

Loads the benchmark's h5 containers (fields ``data``, ``label``, and optionally
``mask`` / ``parts`` / ``type``) and the raw per-object ``.bin`` files
(11 floats per point: x y z nx ny nz r g b label nyu_label, preceded by a
point-count header float).

Behavioral reference: /root/reference/data_utils.py:16-294 (load_h5:249,
load_withmask_h5:255, load_parts_h5:271, load_discriminator_h5:263,
load_pc_file:50, load_data:77, center_data:162, normalize_data:133,
convert_to_binary_mask:280, flip_types:292, save_ply:16).  This module is a
fresh numpy implementation of the same contracts (vectorized over the batch
instead of per-cloud python loops).
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

try:  # h5py is in the base image; keep import soft for minimal installs
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

__all__ = [
    "load_h5",
    "load_withmask_h5",
    "load_parts_h5",
    "load_discriminator_h5",
    "load_pc_file",
    "load_data",
    "center_data",
    "normalize_data",
    "normalize_data_multiview",
    "convert_to_binary_mask",
    "flip_types",
    "save_h5",
    "save_ply",
]

_BIN_FLOATS_PER_POINT = 11  # x y z nx ny nz r g b label nyu_label


def _require_h5py():
    if h5py is None:  # pragma: no cover
        raise ImportError("h5py is required for .h5 dataset loading")


def load_h5(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load ``(data[B,N,3], label[B])`` from an h5 file (ref data_utils.py:249)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        return f["data"][:], f["label"][:]


def load_withmask_h5(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load ``(data, label, mask[B,N])`` (ref data_utils.py:255)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        return f["data"][:], f["label"][:], f["mask"][:]


def load_parts_h5(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load ``(data, label, parts[B,N])`` (ref data_utils.py:271)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        return f["data"][:], f["label"][:], f["parts"][:]


def load_discriminator_h5(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load ``(data, label, type[B])`` (ref data_utils.py:263)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        return f["data"][:], f["label"][:], f["type"][:]


def save_h5(
    path: str,
    data: np.ndarray,
    label: np.ndarray,
    mask: np.ndarray | None = None,
    parts: np.ndarray | None = None,
    model_type: np.ndarray | None = None,
) -> None:
    """Write a ScanObjectNN-format h5 container (inverse of the loaders)."""
    _require_h5py()
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.asarray(data, dtype=np.float32))
        f.create_dataset("label", data=np.asarray(label, dtype=np.int64))
        if mask is not None:
            f.create_dataset("mask", data=np.asarray(mask))
        if parts is not None:
            f.create_dataset("parts", data=np.asarray(parts))
        if model_type is not None:
            f.create_dataset("type", data=np.asarray(model_type))


def load_pc_file(
    path: str, suncg: bool = False, with_bg: bool = True
) -> np.ndarray:
    """Parse one raw ``.bin`` object file → ``[n, 3]`` xyz (ref data_utils.py:50-75).

    Layout: one float32 count header, then ``n`` rows of 11 floats (or 3 for
    suncg).  With ``with_bg=False``, background points are removed by keeping
    only the dominant non-{0,1,2} semantic class (last column), matching the
    reference's intersect/unique/argmax filter.
    """
    pc = np.fromfile(path, dtype=np.float32)
    if suncg:
        pc = pc[1:].reshape((-1, 3))
        return np.array(pc[:, 0:3])
    pc = pc[1:].reshape((-1, _BIN_FLOATS_PER_POINT))
    if with_bg:
        return np.array(pc[:, 0:3])
    sem = pc[:, -1]
    # Match the reference's intersect filter exactly (!=0, !=1, !=2 —
    # wall/floor/ceiling): negative semantic labels (e.g. -1 unannotated)
    # stay foreground candidates, so `sem > 2` would drop them.
    fg = ~np.isin(sem, (0.0, 1.0, 2.0))
    if not np.any(fg):
        return np.empty((0, 3), dtype=np.float32)
    values, counts = np.unique(sem[fg], return_counts=True)
    dominant = values[np.argmax(counts)]
    return np.array(pc[sem == dominant, 0:3])


def load_data(
    path: str,
    num_points: int = 1024,
    suncg: bool = False,
    with_bg: bool = True,
    data_dir: str | None = None,
) -> tuple[list[np.ndarray], list[int]]:
    """Load a pickled file-list dataset of raw .bin objects (ref data_utils.py:77-106).

    Objects with fewer than ``num_points`` points are dropped, as in the
    reference.  ``data_dir`` prefixes the per-entry filenames (the reference
    hardcodes a DATA_PATH global; here it is explicit).
    """
    with open(path, "rb") as handle:
        entries = pickle.load(handle)
    pcs: list[np.ndarray] = []
    labels: list[int] = []
    for entry in entries:
        filename = entry["filename"].replace("objects_bin/", "")
        if data_dir is not None:
            filename = os.path.join(data_dir, filename)
        pc = load_pc_file(filename, suncg=suncg, with_bg=with_bg)
        if pc.shape[0] < num_points:
            continue
        pcs.append(pc)
        labels.append(entry["label"])
    return pcs, labels


def center_data(pcs: np.ndarray | Sequence[np.ndarray]):
    """Subtract each cloud's centroid, in place per cloud (ref data_utils.py:162-169)."""
    if isinstance(pcs, np.ndarray):
        out = pcs - pcs.mean(axis=-2, keepdims=True)
        return out.astype(pcs.dtype, copy=False)
    return [pc - pc.mean(axis=0, keepdims=True) for pc in pcs]


def normalize_data(pcs: np.ndarray | Sequence[np.ndarray]):
    """Scale each cloud by its max point norm → unit sphere (ref data_utils.py:133-143)."""
    if isinstance(pcs, np.ndarray):
        d = np.sqrt((pcs**2).sum(axis=-1)).max(axis=-1)  # [B]
        return (pcs / d[..., None, None]).astype(pcs.dtype, copy=False)
    return [pc / np.sqrt((pc**2).sum(axis=-1)).max() for pc in pcs]


def normalize_data_multiview(pcs: np.ndarray, num_view: int = 5) -> np.ndarray:
    """Per-view unit-sphere normalization for [B, V, N, 3] (ref data_utils.py:145-159)."""
    d = np.sqrt((pcs**2).sum(axis=-1)).max(axis=-1)  # [B, V]
    return pcs / d[..., None, None]


def convert_to_binary_mask(masks: np.ndarray) -> np.ndarray:
    """mask==-1 → 0 (background), everything else → 1 (ref data_utils.py:280-290)."""
    return (np.asarray(masks) != -1).astype(np.float64)


def flip_types(types: np.ndarray) -> np.ndarray:
    """type==0 → True (ref data_utils.py:292-294)."""
    return np.asarray(types) == 0


def save_ply(
    points: np.ndarray,
    filename: str,
    colors: np.ndarray | None = None,
    normals: np.ndarray | None = None,
) -> None:
    """Minimal binary-little-endian PLY writer (ref data_utils.py:16-48).

    Replaces the reference's vendored 916-LoC plyfile.py with a direct writer
    for the one element layout the benchmark uses.
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    props = [("x", "f4"), ("y", "f4"), ("z", "f4")]
    columns = [points[:, 0], points[:, 1], points[:, 2]]
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float32)
        props += [("nx", "f4"), ("ny", "f4"), ("nz", "f4")]
        columns += [normals[:, 0], normals[:, 1], normals[:, 2]]
    if colors is not None:
        colors = (np.asarray(colors) * 255).astype(np.uint8)
        props += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
        columns += [colors[:, 0], colors[:, 1], colors[:, 2]]
    rec = np.empty(n, dtype=props)
    for (name, _), col in zip(props, columns):
        rec[name] = col
    ply_type = {"f4": "float", "u1": "uchar"}
    header_lines = (
        ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        + [f"property {ply_type[fmt]} {name}" for name, fmt in props]
        + ["end_header"]
    )
    with open(filename, "wb") as f:
        f.write(("\n".join(header_lines) + "\n").encode("ascii"))
        rec.tofile(f)


def load_ply(filename: str) -> dict[str, np.ndarray]:
    """Read back PLYs written by :func:`save_ply` (binary_little_endian, one
    vertex element)."""
    with open(filename, "rb") as f:
        props: list[tuple[str, str]] = []
        n = 0
        ply_np = {"float": "f4", "uchar": "u1"}
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property"):
                _, typ, name = line.split()
                props.append((name, ply_np[typ]))
            elif line == "end_header":
                break
        rec = np.fromfile(f, dtype=props, count=n)
    return {name: rec[name] for name, _ in props}
