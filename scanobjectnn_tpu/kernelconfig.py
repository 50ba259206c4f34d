"""Central kernel-dispatch configuration.

Every numerics- or dispatch-affecting kernel option is reachable here
programmatically (and from the CLI via ``TrainerConfig``); the
``SCANOBJECTNN_*`` environment variables remain as EXPLICIT OVERRIDES with
the highest precedence — useful for probes and A/Bs without touching
driver code — but no option is reachable ONLY by env var.

Resolution order (each getter): env var if set → active KernelConfig →
dataclass default.  All getters are read at TRACE time (inside jit-ed
functions they are Python-level), so set the config before building or
calling a jitted program; the Trainer applies its ``TrainerConfig`` fields
at construction.

Reference analog: the argparse flag vocabulary of
/root/reference/pointnet2/train.py:25-47 — the reference exposes every
behavioral knob as a CLI flag; SURVEY.md §5 requires the same discipline
(with the string-boolean foot-guns fixed, not copied).

Options:

  ops_backend    "auto" | "pallas" | "lax" — Pallas kernels on TPU vs the
                 pure-lax reference path (parity-tested equal semantics).
  fused_sa_eval  "on" | "off" | "interpret" — the fully-fused eval-time SA
                 layer (ball select + gather + folded-BN MLP + max-pool in
                 one kernel).  "interpret" forces Pallas interpret mode
                 (CPU parity tests).
  fused_sa_train "on"/True | "off"/False — the custom-VJP fused training
                 tail (grouped_bn_mlp_pool).  Default off: measured net
                 slower than XLA AD on v5e (BENCHMARKS.md).
  sa_bucket      "off" | "auto" | "W,T,G" — the spatially-bucketed fused
                 SA kernel (sorted-window candidate screening).  "auto"
                 picks a per-shape window from the measured table in
                 sabucket_kernel; explicit "W,T,G" pins one config.
  pool_precision "auto" | "native" | "f32" | "keys" — mixed-precision
                 max-pool handling for bf16 training (SYNTH_HARD.md: plain
                 bf16 training collapses the max-pool families; "keys" =
                 exact-key pooling recovers f32-level quality, "f32" keeps
                 the final pre-pool layer f32).  "auto" resolves to "keys"
                 for bf16 training and "native" for f32 (where all modes
                 are no-ops) — resolution happens in the Trainer, which
                 knows the compute dtype.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

__all__ = [
    "KernelConfig",
    "active",
    "set_kernel_config",
    "ops_backend",
    "fused_sa_eval",
    "fused_sa_train",
    "sa_bucket",
    "pool_mode",
]

_CHOICES = {
    "ops_backend": ("auto", "pallas", "lax"),
    "fused_sa_eval": ("on", "off", "interpret"),
    "pool_precision": ("auto", "native", "f32", "keys"),
}


@dataclass(frozen=True)
class KernelConfig:
    ops_backend: str = "auto"
    fused_sa_eval: str = "on"
    fused_sa_train: bool = False
    sa_bucket: str = "auto"
    pool_precision: str = "native"


_active = KernelConfig()


def active() -> KernelConfig:
    return _active


def set_kernel_config(**kw) -> KernelConfig:
    """Update the active config (validated); returns the new config.

    ``pool_precision="auto"`` must be resolved by the caller (the Trainer
    does) — the kernels need a concrete mode."""
    global _active
    for k, v in kw.items():
        if k in _CHOICES and v not in _CHOICES[k]:
            raise ValueError(f"{k}={v!r}: must be one of {_CHOICES[k]}")
        if k == "fused_sa_train":
            kw[k] = bool(v)
        if k == "sa_bucket" and not (
            v in ("off", "auto") or _parse_wtg(v) is not None
        ):
            raise ValueError(f"sa_bucket={v!r}: 'off', 'auto', or 'W,T,G'")
    _active = replace(_active, **kw)
    return _active


def _parse_wtg(v: str):
    try:
        w, t, g = (int(p) for p in v.split(","))
        return (w, t, g)
    except (ValueError, AttributeError):
        return None


# ------------------------------------------------------------------ getters


def ops_backend() -> str:
    env = os.environ.get("SCANOBJECTNN_OPS_BACKEND")
    if env in _CHOICES["ops_backend"]:
        return env
    return _active.ops_backend


def fused_sa_eval() -> str:
    env = os.environ.get("SCANOBJECTNN_FUSED_SA_EVAL")
    if env is not None:
        return {"0": "off", "1": "on", "off": "off", "on": "on"}.get(
            env, "interpret" if env == "interpret" else _active.fused_sa_eval
        )
    return _active.fused_sa_eval


def fused_sa_train() -> bool:
    env = os.environ.get("SCANOBJECTNN_FUSED_SA_TRAIN")
    if env is not None:
        return env == "1"
    return _active.fused_sa_train


def sa_bucket():
    """None (off), "auto", or an explicit (W, T, G) tuple."""
    env = os.environ.get("SCANOBJECTNN_SA_BUCKET")
    v = env if env not in (None, "") else _active.sa_bucket
    if v in ("0", "off"):
        return None
    if v == "auto":
        return "auto"
    return _parse_wtg(v)


def pool_mode() -> str:
    """Concrete pool_f32 mode: "0" (native), "1" (f32 last layer), "keys"
    (exact-key pooling).  Env override uses the historical value set."""
    env = os.environ.get("SCANOBJECTNN_SA_POOL_F32")
    if env is not None and env != "":
        return env if env in ("0", "1", "keys") else "1"
    return {"native": "0", "f32": "1", "keys": "keys", "auto": "0"}[
        _active.pool_precision
    ]
