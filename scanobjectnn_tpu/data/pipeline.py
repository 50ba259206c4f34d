"""Epoch/batch pipeline: the TPU-native replacement for the reference's
per-epoch numpy loops + per-batch ``feed_dict`` uploads.

Reference semantics (kept exactly — they matter for accuracy reproduction):
  * Per-epoch subsampling uses ONE shared point permutation for the whole
    epoch: ``idx_pts`` is shuffled once and every cloud takes the same
    ``idx_pts[:num_points]`` slice (/root/reference/data_utils.py:171-186).
  * Masks/parts are co-sampled with the same permutation
    (data_utils.py:188-233).
  * Cloud order is shuffled per epoch (off for seg eval, ``shuffle=False``,
    /root/reference/pointnet2/evaluate_seg_scenennobjects.py:195).

TPU-native differences:
  * Batches are assembled on host as one contiguous epoch array, then handed
    to jitted, sharded train steps; there is no per-tensor placeholder feed.
  * `shard_batch` lays a global batch out over a `jax.sharding.Mesh` so the
    train step's collectives ride ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

__all__ = [
    "EpochSampler",
    "Batches",
    "is_ragged",
    "pad_or_trim_batch",
    "padded_batches",
]


def is_ragged(data) -> bool:
    """List-of-arrays input (raw .bin datasets with per-cloud sizes) — the
    single definition of raggedness (EpochSampler, the device-eval
    dispatchers, and fit all share it)."""
    return isinstance(data, (list, tuple)) or (
        isinstance(data, np.ndarray) and data.dtype == object
    )


@dataclass
class EpochSampler:
    """Draws reference-faithful epoch views of an in-memory dataset.

    Parameters mirror `get_current_data{_h5,_withmask_h5,_parts_h5}`.
    """

    data: np.ndarray  # [B, N_total, 3]
    labels: np.ndarray  # [B]
    masks: np.ndarray | None = None  # [B, N_total]
    parts: np.ndarray | None = None  # [B, N_total]
    types: np.ndarray | None = None  # [B] (discriminator model-type labels)
    num_points: int = 1024
    shuffle: bool = True
    seed: int | None = None

    def __post_init__(self):
        self._rng = np.random.RandomState(self.seed) if self.seed is not None else np.random

    @property
    def _is_ragged(self) -> bool:
        return is_ragged(self.data)

    def epoch(self) -> dict[str, np.ndarray]:
        """One epoch view.

        Rectangular input (h5): ONE shared point permutation for the whole
        epoch + cloud-order shuffle (data_utils.py:171-186).  Ragged input
        (raw .bin clouds of differing sizes): an INDEPENDENT per-cloud point
        shuffle + subsample, as in get_current_data (data_utils.py:108-131).
        """
        if self._is_ragged:
            # Per-cloud point shuffle + subsample (data_utils.py:108-131).
            # Masks/parts are co-sampled with the same per-cloud permutation;
            # types are per-cloud scalars, co-shuffled with cloud order.
            sampled = []
            sampled_masks = [] if self.masks is not None else None
            sampled_parts = [] if self.parts is not None else None
            for i, pc in enumerate(self.data):
                if pc.shape[0] < self.num_points:
                    raise ValueError(
                        f"cloud has {pc.shape[0]} < num_points={self.num_points}"
                    )
                idx = np.arange(pc.shape[0])
                if self.shuffle:
                    self._rng.shuffle(idx)
                take = idx[: self.num_points]
                sampled.append(pc[take])
                if sampled_masks is not None:
                    sampled_masks.append(np.asarray(self.masks[i])[take])
                if sampled_parts is not None:
                    sampled_parts.append(np.asarray(self.parts[i])[take])
            out = {"points": np.stack(sampled).astype(np.float32)}
            if sampled_masks is not None:
                out["masks"] = np.stack(sampled_masks)
            if sampled_parts is not None:
                out["parts"] = np.stack(sampled_parts)
            order = np.arange(len(self.labels))
            if self.shuffle:
                self._rng.shuffle(order)
            out = {k: v[order] for k, v in out.items()}
            out["labels"] = np.asarray(self.labels)[order]
            if self.types is not None:
                out["types"] = np.asarray(self.types)[order]
            return out

        idx_pts = np.arange(self.data.shape[1])
        if self.shuffle:
            self._rng.shuffle(idx_pts)
        take = idx_pts[: self.num_points]

        sampled = self.data[:, take, :]
        out = {"points": sampled}
        if self.masks is not None:
            out["masks"] = self.masks[:, take]
        if self.parts is not None:
            out["parts"] = self.parts[:, take]

        idx = np.arange(len(self.labels))
        if self.shuffle:
            self._rng.shuffle(idx)
        out = {k: v[idx] for k, v in out.items()}
        out["labels"] = self.labels[idx]
        if self.types is not None:
            # Per-cloud model-type labels, co-shuffled with cloud order
            # (ref data_utils.get_current_data_discriminator_h5:236-251).
            out["types"] = np.asarray(self.types)[idx]
        return out


def pad_or_trim_batch(arr: np.ndarray, batch_size: int) -> np.ndarray:
    """Pad the leading axis up to ``batch_size`` by repeating the last row."""
    n = arr.shape[0]
    if n == batch_size:
        return arr
    if n > batch_size:
        return arr[:batch_size]
    pad = np.repeat(arr[-1:], batch_size - n, axis=0)
    return np.concatenate([arr, pad], axis=0)


class Batches:
    """Iterate fixed-size batches over an epoch view (drops the remainder,
    matching the reference's ``num_batches = size // BATCH_SIZE`` loops,
    e.g. /root/reference/pointnet2/train.py:237-241)."""

    def __init__(self, epoch_view: dict[str, np.ndarray], batch_size: int):
        self.view = epoch_view
        self.batch_size = batch_size
        self.num_batches = len(epoch_view["labels"]) // batch_size

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        bs = self.batch_size
        for i in range(self.num_batches):
            yield {k: v[i * bs : (i + 1) * bs] for k, v in self.view.items()}


def padded_batches(
    epoch_view: dict[str, np.ndarray], batch_size: int
) -> Iterator[tuple[dict[str, np.ndarray], int]]:
    """Iterate fixed-size batches WITHOUT dropping the remainder: the final
    partial batch is padded up to ``batch_size`` (repeating its last row) and
    yielded with its valid count so callers mask padded rows out of every
    tally.  The reference sidesteps remainders by evaluating at BATCH_SIZE=1
    (evaluate_scenennobjects.py:29) — same samples seen, zero dropped.
    """
    n = len(epoch_view["labels"])
    bs = batch_size
    for i in range(0, n, bs):
        chunk = {k: v[i : i + bs] for k, v in epoch_view.items()}
        valid = len(chunk["labels"])
        if valid < bs:
            chunk = {k: pad_or_trim_batch(v, bs) for k, v in chunk.items()}
        yield chunk, valid


def shard_batch(batch: dict, sharding) -> dict:
    """Place a host batch onto devices under a NamedSharding (batch-axis DP)."""
    import jax

    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
