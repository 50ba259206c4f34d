"""Split-file and metadata parsing for the ScanObjectNN benchmark.

Behavioral reference: /root/reference/training_data/ — `main_split.txt` and
`split1..4.txt` are tab-separated ``<file.bin>\t<label>[\t t]`` lines where the
trailing ``t`` marks a TEST object (2902 lines each); `object_labels.txt` is the
object registry ``<scene> <obj_id> <class_name> <size>``; `shape_names_ext.txt`
lists the 15 class names in label order (training_data/README.md:9-12).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

__all__ = ["SplitEntry", "load_split", "load_class_names", "load_object_labels"]


@dataclass(frozen=True)
class SplitEntry:
    filename: str
    label: int
    is_test: bool


def load_split(path: str) -> list[SplitEntry]:
    """Parse a split file into entries (``t`` marker == test membership)."""
    entries: list[SplitEntry] = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            entries.append(
                SplitEntry(
                    filename=parts[0],
                    label=int(parts[1]),
                    is_test=len(parts) > 2 and parts[2].strip() == "t",
                )
            )
    return entries


def split_train_test(entries: list[SplitEntry]) -> tuple[list[SplitEntry], list[SplitEntry]]:
    train = [e for e in entries if not e.is_test]
    test = [e for e in entries if e.is_test]
    return train, test


def load_class_names(path: str) -> list[str]:
    """Read a shape_names file (one class per line, index == label)."""
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def load_object_labels(path: str) -> list[dict]:
    """Parse object_labels.txt rows: scene, object id, class name, point count."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            rows.append(
                {
                    "scene": parts[0],
                    "object_id": parts[1],
                    "class_name": parts[2],
                    "num_points": int(parts[3]),
                }
            )
    return rows


def default_training_data_dir() -> str | None:
    """Locate a training_data/ directory via $SCANOBJECTNN_TRAINING_DATA."""
    env = os.environ.get("SCANOBJECTNN_TRAINING_DATA")
    if env and os.path.isdir(env):
        return env
    return None


def load_part_colormap(path: str) -> list[dict]:
    """Parse a part_labels/*_meta.xml colormap: per-part id, text, RGB color
    (training_data/part_labels/, used by the seg visualization dumps)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    parts = []
    for node in root.findall("class"):
        parts.append(
            {
                "id": int(node.get("id")),
                "text": node.get("text"),
                "color": tuple(int(v) for v in node.get("color").split()),
            }
        )
    return parts
