"""Fused kNN + neighbor-reduce Pallas kernel: the DGCNN EdgeConv engine.

Behavioral reference: dgcnn/utils/tf_util.py:638-704 — per layer, a dense
feature-space kNN graph (self-edge included) followed by get_edge_feature +
conv2d + BN + relu + max over the k neighbors.

The TPU-native reformulation (models/dgcnn.py::EdgeConv):
    edge pre-activation  e_ij = W·concat(x_i, x_j−x_i) + b  =  A_i + B_j
with A = x@(W1−W2)+b and B = x@W2.  Per channel, max_j(A_i+B_j) =
A_i + max_j B_j, and BN∘relu is monotone per channel (direction = sign γ),
so the whole EdgeConv needs only four neighbor reductions of B:
max, min, sum, and sum-of-squares (the last two reconstruct the BN batch
statistics over the full edge population).  None of the [B,N,k,C] edge
tensors ever exist.

This kernel fuses those reductions INTO the kNN extraction loop: each
argmin-extraction round already materializes the one-hot row selector used
to mask the chosen column, and `onehot @ B` on the MXU IS a gather of the
selected neighbor rows — the MXU runs it while the VPU does the next
extraction round, so the gather is time-FREE (measured: kNN alone 4.6 ms,
kNN+gather+reduce 4.8 ms at B32 N1024 k20 C64 on v5e, vs 4.1+5.6 ms for
the separate kNN kernel + XLA row-gather, which runs ~30 GB/s effective).

Exactness: a bf16 one-hot matmul would round the gathered values, so B is
pre-split into three bf16 terms (hi/mid/lo, Dekker-style) and gathered with
three single-pass matmuls — each product is exact (1.0 × bf16 term,
accumulated in f32), recovering full f32 values.  Precision.HIGHEST would
do the same job in 6 MXU passes but costs +3.5 ms (measured); the split
costs ~0.2 ms.

Backward (custom VJP, w.r.t. the values only — kNN indices carry no
gradient, matching the reference's NoGradient top_k): the forward also
saves the gathered values g (k-major [B, k, N, Cv] — nearly free, they are
already in VMEM), the per-edge cotangent coeff = ds + 2g·dq2 +
tie-split max/min terms is one fused XLA elementwise pass over it (the
equality masks select the bit-identical forward values), and ONE batched
one-hot scatter (onehot.flat_scatter) accumulates dvals — no per-round
loop anywhere.  Tie-splitting matches jnp.max's VJP (and tf.reduce_max's).
An earlier per-round backward kernel (rebuild one-hot, regather, scatter,
20 small dependent matmuls) measured 4.2 ms vs this path's ~3.1 ms, and
the same restructuring took gather_neighbors fwd+bwd from 9.2 to 5.8 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "edge_reduce",
    "edge_reduce_lax",
    "edge_reduce_pallas",
    "gather_neighbors",
    "gather_neighbors_pallas",
    "edge_gather_knn",
]

from scanobjectnn_tpu.ops.pallas.onehot import (  # noqa: F401  (re-exports)
    _bf16_pack,
    _bf16_split,
    _interpret,
    _pick_tile,
    _split_matmul,
    _SCATTER_TERMS,
    _SPLIT_TERMS,
)


def _fwd_kernel(feats_ref, vals_ref, mmax_ref, mmin_ref, s_ref, q2_ref,
                cmax_ref, cmin_ref, idxt_ref, *maybe_gall,
                k: int, tile: int, grp: int):
    # maybe_gall holds the [B,k,N,Cv] saved-gather output only when the VJP
    # needs it; the primal-only (inference) variant omits the ref entirely so
    # no dead multi-GB HBM write happens (round-2 ADVICE finding).
    #
    # ``grp`` independent query-tile blocks are processed per program with
    # their k extraction rounds INTERLEAVED: round r of block g has no
    # dependency on round r of block g', so Mosaic can overlap one block's
    # MXU gather with another's VPU argmin, filling the latency bubbles of
    # the serially-dependent rounds (the round-2 latency floor: ~0.94 us per
    # round measured vs ~0.5 us of actual VPU+MXU work).
    gall_ref = maybe_gall[0] if maybe_gall else None
    j = pl.program_id(1)
    feats = feats_ref[0]  # [N, Cf]
    cv = vals_ref[0].shape[-1]
    packed_vals = _bf16_pack(vals_ref[0])  # [N, terms*Cv]
    kk = jnp.sum(feats * feats, axis=1)[None, :]

    d2s, cols = [], []
    for g in range(grp):
        q = feats_ref[0, pl.ds((j * grp + g) * tile, tile), :]  # [T, Cf]
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        inner = lax.dot_general(
            q, feats,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,  # bf16 would flip neighbor choices
        )
        d2s.append(jnp.maximum(qq - 2.0 * inner + kk, 0.0))  # [T, N]
        cols.append(lax.broadcasted_iota(jnp.int32, d2s[-1].shape, dimension=1))

    mmax = [jnp.full((tile, cv), -jnp.inf, jnp.float32) for _ in range(grp)]
    mmin = [jnp.full((tile, cv), jnp.inf, jnp.float32) for _ in range(grp)]
    s = [jnp.zeros((tile, cv), jnp.float32) for _ in range(grp)]
    q2 = [jnp.zeros((tile, cv), jnp.float32) for _ in range(grp)]
    cmax = [jnp.zeros((tile, cv), jnp.float32) for _ in range(grp)]
    cmin = [jnp.zeros((tile, cv), jnp.float32) for _ in range(grp)]
    for r in range(k):
        for g in range(grp):
            # NOTE round 5: the manual two-reduce argmin (knn_kernel.
            # argmin_rows) measured a slight REGRESSION here (edge_reduce
            # fwd+bwd 4.95 -> 5.05 ms) — the grp-interleave already hides
            # the argmin latency, so the extra reduce pass only adds work.
            # jnp.argmin stays.  (knn_kernel's non-interleaved rounds win
            # 2.6x from the same swap.)
            am = jnp.argmin(d2s[g], axis=1).astype(jnp.int32)  # [T]
            onehot = cols[g] == am[:, None]
            gat = _split_matmul(onehot.astype(jnp.bfloat16), packed_vals, cv)
            cmax[g] = jnp.where(gat > mmax[g], 1.0, cmax[g] + (gat == mmax[g]))
            mmax[g] = jnp.maximum(mmax[g], gat)
            cmin[g] = jnp.where(gat < mmin[g], 1.0, cmin[g] + (gat == mmin[g]))
            mmin[g] = jnp.minimum(mmin[g], gat)
            s[g] = s[g] + gat
            q2[g] = q2[g] + gat * gat
            # [k, grp*T] layout: static sublane store
            idxt_ref[0, r, g * tile:(g + 1) * tile] = am
            if gall_ref is not None:
                gall_ref[0, r, g * tile:(g + 1) * tile] = gat
            d2s[g] = jnp.where(onehot, jnp.inf, d2s[g])

    cat = jnp.concatenate
    mmax_ref[0] = cat(mmax, axis=0)
    mmin_ref[0] = cat(mmin, axis=0)
    s_ref[0] = cat(s, axis=0)
    q2_ref[0] = cat(q2, axis=0)
    cmax_ref[0] = cat(cmax, axis=0)
    cmin_ref[0] = cat(cmin, axis=0)


def _pick_grp(n: int, tile: int) -> int:
    """Query-tile blocks interleaved per program (see _fwd_kernel).

    MEASURED NEGATIVE (round 3, v5e, B32 N1024 k20 C64): grp=2 runs
    edge_reduce fwd 5.58 ms vs 4.07 at grp=1 (+37%) and edge_gather_knn
    6.52 vs 4.74 — doubling the live [T, N] d2 buffers + accumulators costs
    more in VMEM/scheduling pressure than the dependent-round latency it
    hides.  The argmin chain is NOT issue-latency-bound at these shapes.
    Default stays 1; the env knob remains for future shapes."""
    import os

    env = os.environ.get("SCANOBJECTNN_EDGE_GRP")
    if env:
        try:
            g = int(env)
        except ValueError:
            return 1
        # g <= 0 (e.g. "0" as a disable convention, cf.
        # SCANOBJECTNN_FUSED_SA_EVAL=0) falls back to the default.
        return g if g > 0 and (n // tile) % g == 0 else 1
    return 1


def _edge_reduce_fwd_pallas(
    feats, vals, k: int, interpret: bool = False, save_gall: bool = True
):
    b, n, cf = feats.shape
    cv = vals.shape[-1]
    tile = _pick_tile(n)  # t256 measured SLOWER (5.5 vs 4.2 ms fwd)
    grp = _pick_grp(n, tile)
    kernel = functools.partial(_fwd_kernel, k=k, tile=tile, grp=grp)
    gt = grp * tile
    tile_spec = pl.BlockSpec((1, gt, cv), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_specs = [
        tile_spec, tile_spec, tile_spec, tile_spec, tile_spec, tile_spec,
        pl.BlockSpec((1, k, gt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, n, cv), jnp.float32)] * 6 + [
        jax.ShapeDtypeStruct((b, k, n), jnp.int32),
    ]
    if save_gall:
        out_specs.append(
            pl.BlockSpec((1, k, gt, cv), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b, k, n, cv), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, n // gt),
        in_specs=[
            pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(feats.astype(jnp.float32), vals.astype(jnp.float32))
    if save_gall:
        *red, idxt, gall = outs
    else:
        *red, idxt = outs
        gall = None
    return (*red, jnp.swapaxes(idxt, 1, 2), gall)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def edge_reduce_pallas(feats, vals, k: int):
    """Fused feature-space kNN + neighbor reductions of ``vals``.

    Args:
      feats: [B, N, Cf] the kNN feature space (self-edge included).
      vals:  [B, N, Cv] the values to reduce over each point's neighbors.
      k: neighbors per point (static).

    Returns dict with mmax/mmin/s/q2 [B, N, Cv] (max / min / sum / sum-of-
    squares of vals over the k neighbors), cntmax/cntmin tie counts, and the
    neighbor idx [B, N, k].  Differentiable w.r.t. ``vals`` only.
    """
    mmax, mmin, s, q2, cmax, cmin, idx, _ = _edge_reduce_fwd_pallas(
        feats, vals, k, interpret=_interpret(), save_gall=False
    )
    return {
        "mmax": mmax, "mmin": mmin, "s": s, "q2": q2,
        "cntmax": cmax, "cntmin": cmin, "idx": idx,
    }


def _er_fwd(feats, vals, k):
    mmax, mmin, s, q2, cmax, cmin, idx, gall = _edge_reduce_fwd_pallas(
        feats, vals, k, interpret=_interpret()
    )
    out = {
        "mmax": mmax, "mmin": mmin, "s": s, "q2": q2,
        "cntmax": cmax, "cntmin": cmin, "idx": idx,
    }
    res = (feats, idx, vals, mmax, mmin, cmax, cmin, gall)
    return out, res


def _er_bwd_kernel(idxk_ref, gall_ref, ds_ref, dq2_ref, dmax_ref, dmin_ref,
                   cmax_ref, cmin_ref, mmax_ref, mmin_ref, out_ref):
    # One program per (batch, kappa): the per-edge cotangent coeff is formed
    # IN-KERNEL from the saved gather and the per-query cotangents — the
    # earlier XLA formulation materialized the [B, k, N, Cv] coeff tensor in
    # HBM (a 168 MB write + read at the DGCNN shape) before the scatter
    # kernel re-read it.  Per-query aux blocks are kappa-invariant, so
    # Mosaic fetches them once per batch element (kappa is the inner grid
    # dim); dvals accumulates in the revisited output block.
    kappa = pl.program_id(1)

    @pl.when(kappa == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    gall = gall_ref[0, 0]  # [N, Cv] — bit-identical forward values
    coeff = (
        ds_ref[0]
        + 2.0 * gall * dq2_ref[0]
        + jnp.where(
            gall == mmax_ref[0],
            dmax_ref[0] / jnp.maximum(cmax_ref[0], 1.0), 0.0,
        )
        + jnp.where(
            gall == mmin_ref[0],
            dmin_ref[0] / jnp.maximum(cmin_ref[0], 1.0), 0.0,
        )
    )
    n, cv = coeff.shape
    idxk = idxk_ref[0, 0]  # [N, 1]
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    onehot = (col == idxk).astype(jnp.bfloat16)
    out_ref[0] = out_ref[0] + _split_matmul(
        onehot, _bf16_pack(coeff, _SCATTER_TERMS), cv, transpose=True
    )


def _er_bwd(k, res, cot):
    feats, idx, vals, mmax, mmin, cmax, cmin, gall = res
    zeros = jnp.zeros_like(mmax)
    dmax = cot.get("mmax", zeros)
    dmin = cot.get("mmin", zeros)
    ds = cot.get("s", zeros)
    dq2 = cot.get("q2", zeros)
    b, _, n, cv = gall.shape
    # k-major idx rows match gall's layout (transpose the tiny int32, not
    # the big gather); trailing singleton keeps the one-hot compare 2-D.
    idx_km = jnp.swapaxes(idx, 1, 2)[..., None]  # [B, k, N, 1]
    aux_spec = pl.BlockSpec(
        (1, n, cv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dvals = pl.pallas_call(
        _er_bwd_kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((1, 1, n, 1), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, cv), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ] + [aux_spec] * 8,
        out_specs=pl.BlockSpec((1, n, cv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cv), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(idx_km, gall, ds, dq2, dmax, dmin, cmax, cmin, mmax, mmin)
    # kNN indices carry no gradient (reference top_k likewise).
    return jnp.zeros_like(feats), dvals.astype(vals.dtype)


edge_reduce_pallas.defvjp(_er_fwd, _er_bwd)


def edge_reduce_lax(feats, vals, k: int):
    """Reference lax composition: kNN graph + gather + reductions.
    Differentiable in ``vals`` through the gather/max (same tie-splitting)."""
    from scanobjectnn_tpu.ops.grouping import batched_index_gather, knn_graph_lax

    idx = knn_graph_lax(lax.stop_gradient(feats), k)
    g = batched_index_gather(vals, idx).astype(jnp.float32)  # [B, N, k, Cv]
    mmax = jnp.max(g, axis=2)
    mmin = jnp.min(g, axis=2)
    return {
        "mmax": mmax,
        "mmin": mmin,
        "s": jnp.sum(g, axis=2),
        "q2": jnp.sum(g * g, axis=2),
        "cntmax": jnp.sum(lax.stop_gradient(g) == mmax[:, :, None], axis=2).astype(jnp.float32),
        "cntmin": jnp.sum(lax.stop_gradient(g) == mmin[:, :, None], axis=2).astype(jnp.float32),
        "idx": idx,
    }


def edge_reduce(feats, vals, k: int):
    """Backend-dispatching fused edge reduce (see edge_reduce_pallas)."""
    from scanobjectnn_tpu.ops.fps import _use_pallas

    if _use_pallas() and feats.shape[1] >= 256 and feats.shape[1] % 8 == 0:
        return edge_reduce_pallas(lax.stop_gradient(feats), vals, k)
    return edge_reduce_lax(feats, vals, k)


# ---------------------------------------------------------------- gather

@jax.custom_vjp
def gather_neighbors_pallas(vals, idx):
    """MXU row gather: [B, N, Cv], int32 [B, M, k] -> [B, M, k, Cv].

    ALL (point, slot) rows of a tile batch into ONE one-hot matmul
    (onehot.flat_gather): on v5e this runs the neighbor gather at MXU
    throughput instead of XLA's row-rate-limited gather (~30 GB/s
    effective) or the earlier latency-bound per-slot rounds.  f32 inputs
    gather exactly (3-term bf16 split); bf16 inputs take the single-pass
    bf16 path — the values are already bf16, a following bf16 matmul
    would round the same way, and the split passes would be pure waste.
    Differentiable in ``vals`` (VJP = one batched transposed one-hot
    scatter-add).
    """
    from scanobjectnn_tpu.ops.pallas.onehot import _flat_gather_impl

    b, m, k = idx.shape
    exact = vals.dtype != jnp.bfloat16
    out = _flat_gather_impl(
        vals.astype(jnp.float32), idx.reshape(b, m * k),
        exact=exact, interpret=_interpret(),
    )
    return out.reshape(b, m, k, vals.shape[-1]).astype(vals.dtype)


def _gn_fwd(vals, idx):
    return gather_neighbors_pallas(vals, idx), (idx, vals)


def _gn_bwd(res, dout):
    from scanobjectnn_tpu.ops.pallas.onehot import _flat_scatter_impl

    idx, vals = res
    b, m, k = idx.shape
    dvals = _flat_scatter_impl(
        idx.reshape(b, m * k),
        dout.reshape(b, m * k, dout.shape[-1]),
        vals.shape[1], interpret=_interpret(),
    )
    return dvals.astype(vals.dtype), None


gather_neighbors_pallas.defvjp(_gn_fwd, _gn_bwd)


def gather_neighbors(vals, idx):
    """Backend-dispatching neighbor gather: Pallas one-hot matmuls on TPU
    (for lane-friendly channel counts), XLA vmap gather elsewhere."""
    from scanobjectnn_tpu.ops.fps import _use_pallas
    from scanobjectnn_tpu.ops.grouping import batched_index_gather

    cv = vals.shape[-1]
    if (
        _use_pallas()
        and vals.shape[1] >= 256
        and idx.shape[1] % 8 == 0
        and cv % 8 == 0
    ):
        return gather_neighbors_pallas(vals, idx)
    return batched_index_gather(vals, idx)


# ------------------------------------------------------- fused kNN + gather

def _knn_gather_kernel(feats_ref, vals_ref, out_ref, idxt_ref, *,
                       k: int, tile: int, grp: int):
    # Same grp-way query-tile interleave as _fwd_kernel: independent round
    # chains fill the dependent-argmin latency bubbles.
    j = pl.program_id(1)
    feats = feats_ref[0]  # [N, Cf]
    cv = vals_ref[0].shape[-1]
    packed_vals = _bf16_pack(vals_ref[0])
    kk = jnp.sum(feats * feats, axis=1)[None, :]

    d2s, cols = [], []
    for g in range(grp):
        q = feats_ref[0, pl.ds((j * grp + g) * tile, tile), :]
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        inner = lax.dot_general(
            q, feats,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d2s.append(jnp.maximum(qq - 2.0 * inner + kk, 0.0))
        cols.append(lax.broadcasted_iota(jnp.int32, d2s[-1].shape, dimension=1))

    for r in range(k):
        for g in range(grp):
            am = jnp.argmin(d2s[g], axis=1).astype(jnp.int32)
            onehot = cols[g] == am[:, None]
            out_ref[0, g * tile:(g + 1) * tile, r, :] = _split_matmul(
                onehot.astype(jnp.bfloat16), packed_vals, cv
            )
            idxt_ref[0, r, g * tile:(g + 1) * tile] = am
            d2s[g] = jnp.where(onehot, jnp.inf, d2s[g])


def _knn_gather_fwd(feats, vals, k: int, interpret: bool = False):
    b, n, cf = feats.shape
    cv = vals.shape[-1]
    tile = _pick_tile(n)
    grp = _pick_grp(n, tile)
    gt = grp * tile
    out, idxt = pl.pallas_call(
        functools.partial(_knn_gather_kernel, k=k, tile=tile, grp=grp),
        grid=(b, n // gt),
        in_specs=[
            pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cv), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gt, k, cv), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, gt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, k, cv), jnp.float32),
            jax.ShapeDtypeStruct((b, k, n), jnp.int32),
        ),
        interpret=interpret,
    )(feats.astype(jnp.float32), vals.astype(jnp.float32))
    return out, jnp.swapaxes(idxt, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def edge_gather_knn(feats, vals, k: int):
    """Fused feature-space kNN + neighbor gather: the gathered rows are
    emitted straight from the extraction rounds' one-hot matmuls, so the
    gather costs no extra time over the kNN itself.

    Returns (gathered [B, N, k, Cv], idx [B, N, k]).  Differentiable in
    ``vals`` only (VJP = the gather_neighbors scatter kernel)."""
    return _knn_gather_fwd(feats, vals, k, interpret=_interpret())


def _egk_fwd(feats, vals, k):
    out, idx = edge_gather_knn(feats, vals, k)
    return (out, idx), (feats, vals, idx)


def _egk_bwd(k, res, cot):
    from scanobjectnn_tpu.ops.pallas.onehot import _flat_scatter_impl

    feats, vals, idx = res
    dout, _ = cot  # idx is integer output — no cotangent
    b, n, kk = idx.shape
    dvals = _flat_scatter_impl(
        idx.reshape(b, n * kk),
        dout.reshape(b, n * kk, dout.shape[-1]),
        vals.shape[1], interpret=_interpret(),
    )
    return jnp.zeros_like(feats), dvals.astype(vals.dtype)


edge_gather_knn.defvjp(_egk_fwd, _egk_bwd)
