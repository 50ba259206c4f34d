"""Auction-algorithm assignment for Earth Mover's Distance.

Behavioral reference: /root/reference/3DmFV-Net/utils/EMD/
(tf_auctionmatch_g.cu, ~294 LoC; wrapper tf_auctionmatch.py:11-29).  The
reference ships this with 3DmFV-Net but no driver uses it (SURVEY.md §2.2 —
"port optional"); it is provided here as a library op for EMD losses.

Jacobi auction (Bertsekas): unassigned bidders (xyz1 points) bid for their
best-value item (xyz2 points) at price + (best − second-best) + ε; each item
goes to its highest bidder.  Every round is dense [B, N, N] VPU/MXU work
under ``lax.while_loop`` — no scalar loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from scanobjectnn_tpu.ops.grouping import pairwise_squared_distance

__all__ = ["auction_match", "emd_loss"]


@partial(jax.jit, static_argnums=(2,))
def auction_match(
    xyz1: jnp.ndarray, xyz2: jnp.ndarray, max_iters: int = 256
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-to-one assignment between two same-size point sets.

    Args:
      xyz1, xyz2: [B, N, 3].
      max_iters: auction round cap (static).  With the ε used here the
        auction terminates in far fewer rounds on benchmark-scale clouds; if
        the cap is hit, remaining bidders fall back to greedy matches (which
        may duplicate items — an approximation, noted for the cap case only).

    Returns:
      (matchl[B, N], matchr[B, N]) int32 — matchl[i] = xyz2 index assigned to
      xyz1 point i; matchr = the owning xyz1 bidder per xyz2 item.
    """
    b, n, _ = xyz1.shape
    benefit = -pairwise_squared_distance(xyz1, xyz2)  # [B, Nb, Ni]
    eps = jnp.maximum(-jnp.min(benefit) / n, 1e-6)

    bidder_range = jnp.arange(n, dtype=jnp.int32)

    def assigned_mask(owner):
        # bidder is assigned iff some item's owner == bidder (owners unique).
        return jnp.any(owner[:, :, None] == bidder_range[None, None, :], axis=1)

    def cond(state):
        owner, _, it = state
        return jnp.logical_and(jnp.any(~assigned_mask(owner)), it < max_iters)

    def body(state):
        owner, price, it = state  # owner [B, Ni] (bidder or -1), price [B, Ni]
        assigned = assigned_mask(owner)  # [B, Nb]
        value = benefit - price[:, None, :]  # [B, Nb, Ni]
        best_item = jnp.argmax(value, axis=-1).astype(jnp.int32)  # [B, Nb]
        best_val = jnp.max(value, axis=-1)
        second_val = jnp.max(
            jnp.where(jax.nn.one_hot(best_item, n, dtype=bool), -jnp.inf, value),
            axis=-1,
        )
        bid = jnp.where(assigned, -jnp.inf, best_val - second_val + eps)  # [B, Nb]

        # Highest bid per item (bidder i bids only on best_item[i]).
        bids_per_item = jnp.where(
            jax.nn.one_hot(best_item, n, dtype=bool), bid[:, :, None], -jnp.inf
        )  # [B, Nb, Ni]
        top_bid = jnp.max(bids_per_item, axis=1)  # [B, Ni]
        top_bidder = jnp.argmax(bids_per_item, axis=1).astype(jnp.int32)
        taken = jnp.isfinite(top_bid)

        owner = jnp.where(taken, top_bidder, owner)
        price = jnp.where(taken, price + top_bid, price)
        return owner, price, it + 1

    init = (
        jnp.full((b, n), -1, jnp.int32),
        jnp.zeros((b, n), jnp.float32),
        jnp.zeros((), jnp.int32),
    )
    owner, _, _ = lax.while_loop(cond, body, init)

    # matchl[bidder] = item owned by that bidder.
    owns = owner[:, :, None] == bidder_range[None, None, :]  # [B, Ni, Nb]
    matchl = jnp.argmax(owns, axis=1).astype(jnp.int32)  # [B, Nb]
    unmatched = ~jnp.any(owns, axis=1)
    # Cap-hit fallback: greedy best item for any leftover bidder.
    matchl = jnp.where(
        unmatched, jnp.argmax(benefit, axis=-1).astype(jnp.int32), matchl
    )
    matchr = owner
    return lax.stop_gradient(matchl), lax.stop_gradient(matchr)


def emd_loss(xyz1: jnp.ndarray, xyz2: jnp.ndarray, max_iters: int = 256) -> jnp.ndarray:
    """Mean matched euclidean distance — the EMD objective the reference's
    auction op supports.  Differentiable in both clouds through the
    (stop-gradient) matching."""
    matchl, _ = auction_match(xyz1, xyz2, max_iters)
    matched = jnp.take_along_axis(
        xyz2, matchl[..., None].repeat(xyz2.shape[-1], -1), axis=1
    )
    return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(xyz1 - matched), axis=-1)))
