"""PointNet++ building blocks: set abstraction (SA), multi-scale grouping
(MSG), and feature propagation (FP) modules.

Behavioral reference: /root/reference/pointnet2/utils/pointnet_util.py
(sample_and_group:22, sample_and_group_all:59, pointnet_sa_module:87,
pointnet_sa_module_msg:156, pointnet_fp_module:199).

TPU-native shape discipline: everything is [B, npoint, nsample, C] with the
shared MLP as a Dense over the last axis (one big MXU matmul per layer) — no
NCHW juggling; XLA picks layouts.  The reference's CPU-registered three_nn /
three_interpolate (which bounce via host in TF, SURVEY.md §3.2) stay fused
on-device here.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from scanobjectnn_tpu import ops
from scanobjectnn_tpu.nn.layers import MLP
from scanobjectnn_tpu.ops.interpolate import three_interpolate_weights
from scanobjectnn_tpu.ops.pallas.edge_kernel import gather_neighbors

__all__ = [
    "sample_and_group",
    "sample_and_group_all",
    "SAModule",
    "SAModuleMSG",
    "GroupMLPPool",
    "LiftedGroupMLP",
    "FPModule",
]


def _fused_sa_train_enabled() -> bool:
    """Gate for the fused TRAINING tail (grouped_bn_mlp_pool): the custom-VJP
    op whose backward recomputes from z1 tiles instead of saving every
    [B, M, K, C] activation across the fwd->bwd boundary.

    Default OFF: measured NET SLOWER than XLA AD at the model level on the
    v5e (scripts/profile_satrain.py — SSG bf16 8.25 vs 5.45 ms, MSG bf16
    30.25 vs 22.46; see BENCHMARKS.md "fused SA training backward").  The
    op stays parity-tested and opt-in (kernelconfig fused_sa_train / the
    SCANOBJECTNN_FUSED_SA_TRAIN=1 env override) as the measured-negative
    record of round-3 VERDICT item 1's prescribed approach;
    scripts/profile_satrain_layers.py holds the per-layer decomposition."""
    from scanobjectnn_tpu import kernelconfig

    return kernelconfig.fused_sa_train()


def _fused_sa_eval_mode() -> str | None:
    """Dispatch gate for the fused eval-time SA kernel: "tpu" (compiled),
    "interpret" (forced, for CPU parity tests), or None (unfused).
    Configured via kernelconfig fused_sa_eval (TrainerConfig/CLI; the
    SCANOBJECTNN_FUSED_SA_EVAL env var overrides)."""
    from scanobjectnn_tpu import kernelconfig

    mode = kernelconfig.fused_sa_eval()
    if mode == "interpret":
        return "interpret"
    if mode == "off":
        return None
    from scanobjectnn_tpu.ops.fps import _use_pallas

    return "tpu" if _use_pallas() else None


def _fused_ball_scale(
    mlp_params,
    mlp_stats,
    n_layers: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    points: jnp.ndarray | None,
    use_xyz: bool,
    xyz_first: bool,
    dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One fully-fused eval-time ball-grouped SA scale: fold the eval-mode
    BN into the Dense weights and run ball select + gather + MLP + max-pool
    in a single kernel.  Shared by SAModule (SSG order, xyz_first=True) and
    SAModuleMSG (per K<=64 scale, xyz_first=False) so the gating/fold/call
    recipe cannot drift between them.  Returns (pooled, idx)."""
    from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
    from scanobjectnn_tpu.ops.pallas.samlp_kernel import fold_bn_mlp_params

    weights, biases = fold_bn_mlp_params(mlp_params, mlp_stats, n_layers)
    return sa_ball_mlp_pool(
        radius,
        nsample,
        xyz,
        new_xyz,
        points,
        weights,
        biases,
        use_xyz=use_xyz,
        xyz_first=xyz_first,
        dtype=dtype,
        interpret=_fused_sa_eval_mode() == "interpret",
        # The models discard the SA idx at eval, which opts the no-src
        # shape into the spatially-bucketed kernel (idx comes back None
        # when it engages — see sabucket_kernel.py).
        need_idx=False,
    )


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: jnp.ndarray | None,
    knn: bool = False,
    use_xyz: bool = True,
):
    """FPS → neighborhood query → gather → center-subtract → concat-xyz
    (ref pointnet_util.py:22-56).

    Returns (new_xyz[B,np,3], new_points[B,np,ns,3+C], idx, grouped_xyz).
    """
    fps_idx = ops.farthest_point_sample(xyz, npoint)
    new_xyz = ops.gather_point(xyz, fps_idx)
    if knn:
        _, idx = ops.knn_point(nsample, xyz, new_xyz)
        grouped_xyz = ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
    else:
        # Fused ball query + centered grouping (Pallas on TPU for large N).
        # NOTE fusing the FEATURE gather into the same kernel was measured
        # SLOWER at SA2 shapes (7.7-8.7 vs 5.8 ms separate at B=128 — the
        # widened split costs a second MXU tile per slot matmul plus
        # per-slot padding passes); see docs/KERNELS.md dead ends.
        grouped_xyz, idx, _ = ops.query_ball_group(radius, nsample, xyz, new_xyz)
    if points is not None:
        # Batched one-hot MXU gather on TPU (2.7 -> 1.8 ms fwd, 3.6 -> 2.4
        # fwd+bwd at SA2 shapes); falls back to the XLA row gather
        # elsewhere.  Gradient via the 2-term bf16 split scatter (the
        # kernels' shared convention; parity pinned in test_ops_parity).
        grouped_points = gather_neighbors(points, idx)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: jnp.ndarray, points: jnp.ndarray | None, use_xyz: bool = True):
    """Single group containing every point, centroid (0,0,0)
    (ref pointnet_util.py:59-85)."""
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    idx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None, None, :], (b, 1, 1))
    grouped_xyz = xyz[:, None, :, :]
    if points is not None:
        if use_xyz:
            new_points = jnp.concatenate([xyz, points], axis=-1)
        else:
            new_points = points
        new_points = new_points[:, None, :, :]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


class SAModule(nn.Module):
    """PointNet Set Abstraction (ref pointnet_util.py:87-154).

    mlp over grouped neighborhoods → pooling (max/avg/weighted_avg/
    max_and_avg) → optional mlp2 on pooled features.
    """

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    mlp2: Sequence[int] | None = None
    group_all: bool = False
    pooling: str = "max"
    knn: bool = False
    use_xyz: bool = True
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: jnp.ndarray | None,
        train: bool = False,
        bn_momentum=0.9,
    ):
        # Eval-time fused path: gather + folded-BN MLP + max-pool in one
        # Pallas kernel (no [B, M, K, C] inter-layer HBM round trips —
        # measured ~11 ms of the B=128 headline forward in the unfused
        # form).  Training keeps the unfused path (BN needs batch stats
        # over the whole grouped set); init must run it to create params.
        if (
            not train
            and not self.is_initializing()
            and self.pooling == "max"
            and not self.group_all
            and _fused_sa_eval_mode() is not None
            and self.npoint % 8 == 0
            and xyz.shape[1] % 8 == 0
        ):
            from scanobjectnn_tpu.ops.pallas.samlp_kernel import (
                fold_bn_mlp_params,
                sa_mlp_pool,
            )

            # idx + centroid coords in ONE kernel pass (saves the ~1.3 ms
            # row gather at B=128 eval shapes; bit-identical coordinates).
            fps_idx, new_xyz = ops.farthest_point_sample_with_coords(
                xyz, self.npoint
            )
            mlp_stats = (
                self.variables["batch_stats"]["mlp"] if self.bn else None
            )
            if not self.knn and self.nsample <= 64:
                # Fully-fused layer: ball select + gather + MLP + pool in
                # ONE kernel — grouped coords/idx never round-trip HBM
                # (measured −2.8 ms SA1, −2.8 ms SA2 at B=128 vs the
                # two-kernel chain; bit-exact parity on-chip).
                pooled, idx = _fused_ball_scale(
                    self.variables["params"]["mlp"],
                    mlp_stats,
                    len(self.mlp),
                    self.radius,
                    self.nsample,
                    xyz,
                    new_xyz,
                    points,
                    use_xyz=self.use_xyz,
                    xyz_first=True,
                    dtype=self.dtype or xyz.dtype,
                )
            else:
                weights, biases = fold_bn_mlp_params(
                    self.variables["params"]["mlp"], mlp_stats,
                    n_layers=len(self.mlp),
                )
                if self.knn:
                    _, idx = ops.knn_point(self.nsample, xyz, new_xyz)
                    grouped_xyz = (
                        ops.group_point(xyz, idx) - new_xyz[:, :, None, :]
                    )
                else:
                    grouped_xyz, idx, _ = ops.query_ball_group(
                        self.radius, self.nsample, xyz, new_xyz
                    )
                pooled = sa_mlp_pool(
                    grouped_xyz if self.use_xyz or points is None else None,
                    idx if points is not None else None,
                    points,
                    weights,
                    biases,
                    dtype=self.dtype or xyz.dtype,
                    interpret=_fused_sa_eval_mode() == "interpret",
                )
            if self.mlp2:
                pooled = MLP(
                    self.mlp2, bn=self.bn, dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name, name="mlp2",
                )(pooled, train=train, bn_momentum=bn_momentum)
            return new_xyz, pooled, idx

        if self.group_all:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                xyz, points, self.use_xyz
            )
        else:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points, self.knn, self.use_xyz
            )

        if self.pooling == "max":
            # Max-pool layers route through GroupMLPPool: identical param
            # tree to MLP, fused custom-VJP training tail (see its doc).
            pooled = GroupMLPPool(
                self.mlp, bn=self.bn, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name="mlp",
            )(new_points, train=train, bn_momentum=bn_momentum)
            if self.mlp2:
                pooled = MLP(
                    self.mlp2, bn=self.bn, dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name, name="mlp2",
                )(pooled, train=train, bn_momentum=bn_momentum)
            return new_xyz, pooled, idx

        new_points = MLP(
            self.mlp, bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="mlp"
        )(new_points, train=train, bn_momentum=bn_momentum)

        if self.pooling == "avg":
            pooled = jnp.mean(new_points, axis=2)
        elif self.pooling == "weighted_avg":
            # exp(-5·dist) weights over the neighborhood (ref :131-137)
            dists = jnp.linalg.norm(grouped_xyz.astype(jnp.float32), axis=-1, keepdims=True)
            w = jnp.exp(-dists * 5.0)
            w = w / jnp.sum(w, axis=2, keepdims=True)
            pooled = jnp.sum(new_points * w.astype(new_points.dtype), axis=2)
        elif self.pooling == "max_and_avg":
            pooled = jnp.concatenate(
                [jnp.mean(new_points, axis=2), jnp.max(new_points, axis=2)], axis=-1
            )
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")

        if self.mlp2:
            pooled = MLP(
                self.mlp2, bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="mlp2"
            )(pooled, train=train, bn_momentum=bn_momentum)
        return new_xyz, pooled, idx


def _fused_train_tail(mdl, z1, bn_momentum):
    """Shared fused-training tail: BN0→relu→(Dense→BN→relu)*→max-pool via
    grouped_bn_mlp_pool, reading layer params from ``mdl``'s own variable
    tree (MLP-compatible dense_i/bn_i names) and updating the running BN
    stats through the BatchNorm modules in update_only mode.  Called from
    GroupMLPPool and LiftedGroupMLP (pool=True) so the recipe cannot drift
    between the SSG and MSG-lifted formulations."""
    from scanobjectnn_tpu.nn.layers import BatchNorm
    from scanobjectnn_tpu.ops.pallas.satrain_kernel import grouped_bn_mlp_pool

    n_layers = len(mdl.features)
    params = mdl.variables["params"]
    gammas = tuple(params[f"bn_{i}"]["scale"] for i in range(n_layers))
    betas = tuple(params[f"bn_{i}"]["bias"] for i in range(n_layers))
    ws = tuple(params[f"dense_{i}"]["kernel"] for i in range(1, n_layers))
    bs = tuple(params[f"dense_{i}"]["bias"] for i in range(1, n_layers))
    pooled, means, variances = grouped_bn_mlp_pool(z1, gammas, betas, ws, bs)
    for i in range(n_layers):
        BatchNorm(
            dtype=mdl.dtype, axis_name=mdl.bn_axis_name, name=f"bn_{i}"
        )(
            means[i], use_running_average=False, momentum=bn_momentum,
            override_stats=(means[i], variances[i]), update_only=True,
        )
    return pooled


class GroupMLPPool(nn.Module):
    """Grouped shared-MLP + max-pool over the neighbor axis (axis 2), with a
    fused TRAINING path: Dense_0 runs as a normal flax layer (so XLA AD
    handles its weights and everything upstream — gathers, lifts, concats),
    and the BN0→relu→(Dense→BN→relu)*→max tail runs through
    ``grouped_bn_mlp_pool`` (ops/pallas/satrain_kernel.py), whose backward
    recomputes the chain from z1 tiles in VMEM instead of saving each
    [B, M, K, C] activation across the step's fwd→bwd boundary (round-3
    VERDICT item 1; the analog of DGCNN's fused-coefficient backward).

    The parameter/variable tree matches ``nn.layers.MLP`` exactly
    (dense_i / bn_i), so checkpoints interoperate and the eval-time BN fold
    (fold_bn_mlp_params) works unchanged; running stats are updated by the
    BatchNorm modules in ``update_only`` mode with the op's batch stats.
    Non-fused cases (eval, init, bn=False, cross-replica axis_name, env
    opt-out) run the plain MLP loop + max inline.

    Reference semantics: the conv2d+BN+relu stack + reduce_max of
    pointnet_util.py:87-154 in training mode (batch statistics)."""

    features: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, bn_momentum=0.9
    ) -> jnp.ndarray:
        from scanobjectnn_tpu.nn.layers import BatchNorm, Dense

        from scanobjectnn_tpu.ops.pallas.satrain_kernel import _pool_f32_mode

        fused = (
            train
            and self.bn
            and self.bn_axis_name is None
            and not self.is_initializing()
            and _fused_sa_train_enabled()
            # the fused tail implements pool_f32 modes "0"/"1" only
            and _pool_f32_mode() != "keys"
        )
        if not fused:
            from scanobjectnn_tpu.nn.layers import mlp_final_max

            # The last layer + pool route through mlp_final_max, which
            # implements the pool_f32 mixed-precision modes (round-3 VERDICT
            # item 8): "1" keeps the final pre-pool layer f32 (exact tie
            # credit; measured ~55% of the bf16 speedup retained), "keys"
            # keeps the value chain bf16 and decides winners by a
            # stop-gradient f32 key copy (exact ties at ~full bf16 speed).
            # Mode "0"/eval is the plain chain.  Parity with the fused
            # satrain path is pinned by test_satrain_fused.
            n = len(self.features)
            for i, f in enumerate(self.features[:-1]):
                x = Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
                if self.bn:
                    x = BatchNorm(
                        dtype=self.dtype, axis_name=self.bn_axis_name,
                        name=f"bn_{i}",
                    )(x, use_running_average=not train, momentum=bn_momentum)
                x = nn.relu(x)
            return mlp_final_max(
                self, x, self.features[-1], n - 1, 2, train, bn_momentum,
                bn=self.bn,
            )

        z1 = Dense(self.features[0], dtype=self.dtype, name="dense_0")(x)
        return _fused_train_tail(self, z1, bn_momentum)


class LiftedGroupMLP(nn.Module):
    """Shared MLP over grouped neighborhoods with the FIRST Dense lifted to
    per-point, applied BEFORE the neighbor gather — an exact linear
    refactoring of Dense(concat(feats_j, p_j − q)):

        [f_j, p_j − q]·W + b  =  ([f_j, p_j]·W + b)  −  [0, q]·W

    so the first layer runs over the N source points instead of the M·K
    edges (32× fewer rows at MSG SA2) and the gather moves C_mid channels
    instead of C_in (64 vs 323 at MSG SA2 scale 3).  BN/relu and the
    remaining layers act per-edge exactly as before — same values up to
    f32 summation regrouping.  Parameter tree matches nn.layers.MLP
    (dense_i / bn_i), so checkpoints are interchangeable with the
    gather-then-MLP formulation.  The same trick powers the DGCNN EdgeConv
    kernel (models/dgcnn.py A+B decomposition)."""

    features: Sequence[int]
    xyz_first: bool = False  # concat order: True = [xyz, feats] (SSG), False = [feats, xyz] (MSG)
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None
    # pool=True max-pools over the neighbor axis INSIDE the module, enabling
    # the fused custom-VJP training tail (the lifted pre-activation x IS the
    # op's z1 input); callers then drop their own jnp.max.
    pool: bool = False

    @nn.compact
    def __call__(
        self,
        point_feats: jnp.ndarray | None,
        xyz: jnp.ndarray,
        query_xyz: jnp.ndarray,
        idx: jnp.ndarray,
        train: bool = False,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        from scanobjectnn_tpu.nn.layers import BatchNorm, Dense

        # The xyz kernel rows multiply UNCENTERED coordinates here (the
        # grouped form multiplies centered p−q), so those products must be
        # f32-exact or the p·W − q·W cancellation amplifies the default
        # bf16-operand rounding by ~|p|/|p−q|; highest_cols pins them.
        n_xyz = xyz.shape[-1]
        if point_feats is None:
            hi = (0, n_xyz)
        else:
            c_feat = point_feats.shape[-1]
            hi = (0, n_xyz) if self.xyz_first else (c_feat, c_feat + n_xyz)
        d0 = Dense(
            self.features[0], dtype=self.dtype, highest_cols=hi, name="dense_0"
        )
        if point_feats is None:
            pointwise = d0(xyz)
            qfull = d0(query_xyz)
        else:
            parts = (
                [xyz, point_feats] if self.xyz_first else [point_feats, xyz]
            )
            pointwise = d0(jnp.concatenate(parts, axis=-1))
            b, m, _ = query_xyz.shape
            zeros = jnp.zeros(
                (b, m, point_feats.shape[-1]), query_xyz.dtype
            )
            qparts = [query_xyz, zeros] if self.xyz_first else [zeros, query_xyz]
            qfull = d0(jnp.concatenate(qparts, axis=-1))
        c_in = xyz.shape[-1] + (0 if point_feats is None else point_feats.shape[-1])
        bias = d0(jnp.zeros((1, 1, c_in), xyz.dtype))
        # per-edge pre-activation: pointwise_j − ([…0…, q]·W) — qfull carries
        # the bias too, so add it back once.  The dense outputs stay f32
        # (Dense.highest_cols contract); round to the compute dtype only
        # AFTER the cancellation, at the centered |p−q|·|W| scale.
        from scanobjectnn_tpu.ops.pallas.satrain_kernel import _pool_f32_mode

        x32 = gather_neighbors(pointwise, idx) - (qfull - bias)[:, :, None, :]
        x = x32.astype(self.dtype) if self.dtype is not None else x32
        if (
            self.pool
            and train
            and self.bn
            and self.bn_axis_name is None
            and not self.is_initializing()
            and _fused_sa_train_enabled()
            and _pool_f32_mode() != "keys"  # fused tail: modes "0"/"1" only
        ):
            # x is exactly the op's z1 (layer-0 pre-BN pre-activation).
            return _fused_train_tail(self, x, bn_momentum)
        from scanobjectnn_tpu.nn.layers import mlp_final_max

        n_layers = len(self.features)
        for i, f in enumerate(self.features):
            last = i == n_layers - 1
            if last and self.pool:
                # Last layer + pool via mlp_final_max (the pool_f32 mixed-
                # precision modes; see GroupMLPPool).  Layer 0 has no Dense
                # of its own here — x32 supplies the unrounded pre-BN input
                # for the "keys" mode.
                return mlp_final_max(
                    self, x, f, i, 2, train, bn_momentum, bn=self.bn,
                    skip_dense=(i == 0), x32=x32 if i == 0 else None,
                )
            if i > 0:
                x = Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            if self.bn:
                x = BatchNorm(
                    dtype=self.dtype, axis_name=self.bn_axis_name, name=f"bn_{i}"
                )(x, use_running_average=not train, momentum=bn_momentum)
            x = nn.relu(x)
        return jnp.max(x, axis=2) if self.pool else x


class SAModuleMSG(nn.Module):
    """Multi-scale grouping SA (ref pointnet_util.py:156-196): one FPS, a
    ball query + MLP + max-pool per radius, concat over scales.

    ``remat_scales`` puts each scale's grouped-MLP + max-pool behind a
    ``jax.checkpoint`` boundary whose SAVED residuals are only the scale
    inputs (points, idx, grouped coords) and the pooled output — the
    [B, M, K, C] per-layer activations are recomputed in the backward
    instead of round-tripping HBM across fwd→bwd.  Unlike whole-step remat
    (measured NEGATIVE: it recomputes the FPS/ball-query kernels), the
    neighborhood kernels stay OUTSIDE the boundary.  Values are identical;
    the flag is purely a time/memory trade measured per config.

    Measured NEGATIVE for the reference MSG config too (B16/N1024 f32
    loss+grad: 34.1 ms off vs 41.6 ms on) — even with the neighborhood
    kernels excluded, replaying the grouped-MLP stacks re-reads the
    [B, M, K, C_in] grouped inputs and re-runs the conv/BN chain, which
    costs more than the saved residual write-back.  Kept (default off)
    for memory-constrained configs where the trade flips."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    use_xyz: bool = True
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None
    remat_scales: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: jnp.ndarray | None,
        train: bool = False,
        bn_momentum=0.9,
    ):
        # Eval-time fully-fused scales: ball select + gather + folded-BN
        # MLP + max-pool in one kernel per scale (safused_kernel.py —
        # K<=64 unrolled, K%16==0 chunked; other K keep the unfused chain).
        # Same gating as SAModule's fused branch; LiftedGroupMLP's param
        # tree is MLP-compatible, so fold_bn_mlp_params folds either
        # formulation's params.
        fused_eval = (
            not train
            and not self.is_initializing()
            and _fused_sa_eval_mode() is not None
            and self.npoint % 8 == 0
            and xyz.shape[1] % 8 == 0
        )
        if fused_eval:
            fps_idx, new_xyz = ops.farthest_point_sample_with_coords(
                xyz, self.npoint
            )
        else:
            fps_idx = ops.farthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_point(xyz, fps_idx)
        # All scales query the same (xyz, new_xyz) pair; per-radius calls —
        # a fused multi-radius kernel measured a wash (see
        # ops.query_ball_group_multi for the measured fusion story).
        def _scale_fusable(k: int) -> bool:
            # K<=64 unrolled or K%16==0 chunked (idx is discarded here, so
            # the chunked path's idx=None is fine).
            return k <= 64 or k % 16 == 0

        groups = {
            i: ops.query_ball_group(
                self.radius_list[i], self.nsample_list[i], xyz, new_xyz
            )
            for i, k in enumerate(self.nsample_list)
            if not (fused_eval and _scale_fusable(k))
        }
        scale_feats = []
        for i, (radius, nsample, mlp) in enumerate(
            zip(self.radius_list, self.nsample_list, self.mlp_list)
        ):
            if fused_eval and _scale_fusable(nsample):
                pooled, _ = _fused_ball_scale(
                    self.variables["params"][f"mlp_scale{i}"],
                    self.variables["batch_stats"][f"mlp_scale{i}"]
                    if self.bn else None,
                    len(mlp),
                    radius,
                    nsample,
                    xyz,
                    new_xyz,
                    points,
                    use_xyz=self.use_xyz,
                    xyz_first=False,  # MSG concat order is [feats, xyz]
                    dtype=self.dtype or xyz.dtype,
                )
                scale_feats.append(pooled)
                continue
            grouped_xyz, idx, _ = groups[i]
            lifted = (
                points is not None
                and self.use_xyz
                and points.shape[-1] + 3 > mlp[0]
            )

            def scale_fn(
                mdl, point_feats, xyz_a, new_xyz_a, idx_a, grouped_xyz_a,
                bn_momentum_a, *, _i=i, _mlp=mlp, _lifted=lifted,
            ):
                if _lifted:
                    # Lifted first conv: Dense_0 runs per-point BEFORE the
                    # gather, so the neighbor gather moves C_mid channels
                    # instead of C_in (64 vs 323 at SA2 scale 3) — an exact
                    # linear refactoring with an MLP-compatible param tree.
                    # Engaged only when it SHRINKS the gather (C_in > C_mid):
                    # lifting every scale, including SA1's points=None scales
                    # (which do no feature gather at all), measured a net LOSS
                    # (47.3 vs 40.0 ms/step).  MSG concatenates [points, xyz]
                    # — opposite order to SSG (ref pointnet_util.py:176-177)
                    # — hence xyz_first=False.  pool=True: the max runs
                    # inside the module, enabling its fused training tail.
                    return LiftedGroupMLP(
                        _mlp, xyz_first=False, bn=mdl.bn, dtype=mdl.dtype,
                        bn_axis_name=mdl.bn_axis_name, pool=True,
                        name=f"mlp_scale{_i}",
                    )(
                        point_feats, xyz_a, new_xyz_a, idx_a,
                        train=train, bn_momentum=bn_momentum_a,
                    )
                if point_feats is not None:
                    grouped = gather_neighbors(point_feats, idx_a)
                    if mdl.use_xyz:
                        # MSG concatenates [points, xyz] — opposite order
                        # to SSG (ref pointnet_util.py:176-177).
                        grouped = jnp.concatenate(
                            [grouped, grouped_xyz_a], axis=-1
                        )
                else:
                    grouped = grouped_xyz_a
                return GroupMLPPool(
                    _mlp, bn=mdl.bn, dtype=mdl.dtype,
                    bn_axis_name=mdl.bn_axis_name, name=f"mlp_scale{_i}",
                )(grouped, train=train, bn_momentum=bn_momentum_a)

            if self.remat_scales and not self.is_initializing():
                scale_fn = nn.remat(scale_fn)
            scale_feats.append(
                scale_fn(
                    self, points, xyz, new_xyz, idx, grouped_xyz, bn_momentum
                )
            )
        return new_xyz, jnp.concatenate(scale_feats, axis=-1)


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance upsampling + unit MLP
    (ref pointnet_util.py:199-229)."""

    mlp: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz1: jnp.ndarray,
        xyz2: jnp.ndarray,
        points1: jnp.ndarray | None,
        points2: jnp.ndarray,
        train: bool = False,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        dist, idx = ops.three_nn(xyz1, xyz2)
        weight = three_interpolate_weights(dist)
        interpolated = ops.three_interpolate(points2, idx, weight)
        if points1 is not None:
            interpolated = jnp.concatenate([interpolated, points1], axis=-1)
        return MLP(
            self.mlp, bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="mlp"
        )(interpolated, train=train, bn_momentum=bn_momentum)
