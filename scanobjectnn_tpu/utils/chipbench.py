"""On-chip micro-benchmark harness (the ONE timing methodology).

Two hard-won facts about this image's tunneled TPU shape every number this
repo reports (BENCHMARKS.md "Methodology"):

1. ``block_until_ready()`` is NOT a barrier — it can return before the
   device executes.  The only reliable sync is a host scalar readback, so a
   measurement must be a serial dependency chain inside ONE jitted call
   ending in ``float(...)``.

2. One chained call pays a FIXED ~24-37 ms host dispatch + readback,
   regardless of iteration count (measured round 4: a no-op 30-iteration
   chain costs ~37 ms; the same chain at 300 iterations costs ~32 ms).
   Dividing a single call's wall time by its iteration count therefore
   inflates every number by ~C/n — +0.9 ms/iter at n=30, which round 3
   mistook for real kernel time (an XLA transpose "measured" 0.92 ms; its
   true cost is ~5 us).

``timed_ms`` returns the SLOPE of total wall time between a short and a
long chain, which cancels the fixed term exactly; the slope is the
steady-state per-iteration time a pipelined serving/training loop sees.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["chain_seconds", "timed_ms", "ITERS_LO", "ITERS_HI"]

ITERS_LO, ITERS_HI = 30, 300


def chain_seconds(f, *args, iters: int, repeats: int = 3) -> float:
    """Best-of-``repeats`` wall seconds of ``f(*args)`` chained ``iters``
    times serially inside one jit.  ``args[0]`` is a pytree of arrays; every
    leaf is perturbed by the chained output scalar each iteration so XLA
    cannot hoist the body out of the loop."""

    @jax.jit
    def chain(*a):
        def body(i, carry):
            a0, acc = carry
            out = f(a0, *a[1:])
            s = sum(
                jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(out)
            )
            a0 = jax.tree.map(
                lambda t: t * (1.0 + 1e-20 * s).astype(t.dtype), a0
            )
            return a0, acc + s

        a0, acc = lax.fori_loop(0, iters, body, (a[0], jnp.float32(0)))
        tail = sum(jnp.sum(t).astype(jnp.float32) for t in jax.tree.leaves(a0))
        return acc + tail * 0e0

    float(chain(*args))  # compile + warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timed_ms(
    f,
    *args,
    lo: int = ITERS_LO,
    hi: int = ITERS_HI,
    repeats: int = 3,
    name: str | None = None,
) -> float:
    """Steady-state ms/iteration of ``f(*args)``: the slope between a
    ``lo``- and a ``hi``-iteration chain (cancels the fixed per-call
    dispatch).  Prints ``name`` when given."""
    t_lo = chain_seconds(f, *args, iters=lo, repeats=repeats)
    t_hi = chain_seconds(f, *args, iters=hi, repeats=repeats)
    ms = max((t_hi - t_lo) / (hi - lo), 0.0) * 1000.0
    if name is not None:
        print(f"{name:58s} {ms:8.3f} ms", flush=True)
    return ms
