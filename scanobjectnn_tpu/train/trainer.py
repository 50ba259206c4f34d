"""The unified training loop: ONE trainer for every model family.

Replaces the reference's six cloned driver stacks (pointnet2/train.py:136-310,
train_seg.py, train_partseg.py, and their copies in each method folder) with a
single pjit-sharded implementation:

  * the train step — augmentation, forward, loss, backward, optimizer update,
    BN running-stat update, metric computation — is ONE jitted function over a
    device mesh; the global batch is sharded on the 'data' axis and GSPMD
    inserts gradient psums over ICI (the reference's feed_dict loop and absent
    NCCL story, SURVEY.md §2.6);
  * LR and BN-momentum schedules trace into the step (train.py:116-134
    semantics, schedules.py);
  * checkpointing is orbax, every epoch, with --resume (the reference requires
    hand-uncommenting saver.restore, SURVEY.md §5);
  * metrics match the reference logs: mean loss, overall accuracy, avg-class
    accuracy, per-class table, seg accuracy (computed from seg predictions —
    the reference's train_seg.py:161 reuses the cls correctness by mistake;
    documented deviation).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from scanobjectnn_tpu import augment as aug
from scanobjectnn_tpu import models as model_zoo
from scanobjectnn_tpu.data.pipeline import Batches, EpochSampler
from scanobjectnn_tpu.parallel import mesh as mesh_lib
from scanobjectnn_tpu.train import schedules
from scanobjectnn_tpu.utils.logging import Logger

__all__ = ["TrainerConfig", "TrainState", "Trainer"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclass
class TrainerConfig:
    """Flag vocabulary mirroring the reference drivers (pointnet2/train.py:25-47)."""

    model: str = "pointnet2_cls_ssg"
    num_classes: int = 15
    num_point: int = 1024
    batch_size: int = 16
    max_epoch: int = 250
    learning_rate: float = 1e-3
    momentum: float = 0.9
    optimizer: str = "adam"
    decay_step: int = 200_000
    decay_rate: float = 0.7
    seg_weight: float = 0.5
    reg_weight: float = 0.001
    weight_decay: float = 0.0
    # Compute dtype for model activations/matmuls (params stay f32).
    # f32 is the TRAINING default on measurement: bf16 training collapses
    # the max-pool families on near-threshold tasks (in-network compute
    # noise, not input quantization — SYNTH_HARD.md probe table), while
    # bf16 INFERENCE is parity-tested and is how the headline bench runs.
    dtype: str = "float32"
    seed: int = 0
    log_dir: str | None = None
    augment_rotate: bool = True
    augment_jitter: bool = True
    # Honor the training recipe the model family ships with (PointCNN's
    # settings-module schedule: step-based LR decay, weight decay, Adam
    # epsilon, in-graph xform augmentation).  False = generic driver flags,
    # like pointing the pointnet2 trainer at PointCNN would.
    use_model_recipe: bool = True
    model_kwargs: dict = field(default_factory=dict)
    checkpoint_every: int = 1
    # Keep the whole training set in HBM and run each epoch as ONE jitted
    # program (no per-batch host traffic).  Disable for datasets larger than
    # device memory or for bit-level host-RNG parity studies.
    device_resident: bool = True
    # Kernel dispatch (scanobjectnn_tpu.kernelconfig): applied process-wide
    # at Trainer construction, read by the kernels at trace time.  The
    # SCANOBJECTNN_* env vars override these (probe/experiment escape
    # hatch); see README "Configuration" for the full matrix.
    ops_backend: str = "auto"
    fused_sa_eval: str = "on"
    fused_sa_train: bool = False
    sa_bucket: str = "auto"
    # "auto" resolves against dtype: exact-key pooling ("keys") for bf16
    # training — plain bf16 pooling collapses the max-pool families
    # (SYNTH_HARD.md) — and "native" for f32 (all modes are no-ops there).
    pool_precision: str = "auto"

    @property
    def jnp_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


class Trainer:
    """Builds, shards, trains, and evaluates any registered model."""

    def __init__(self, config: TrainerConfig, mesh=None, logger: Logger | None = None):
        self.config = config
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.logger = logger or Logger(config.log_dir)

        # Apply the kernel-dispatch fields (read by kernels at trace time;
        # env vars still override — kernelconfig precedence).
        from scanobjectnn_tpu import kernelconfig

        pool = config.pool_precision
        if pool == "auto":
            pool = "keys" if config.dtype == "bfloat16" else "native"
        kernelconfig.set_kernel_config(
            ops_backend=config.ops_backend,
            fused_sa_eval=config.fused_sa_eval,
            fused_sa_train=config.fused_sa_train,
            sa_bucket=config.sa_bucket,
            pool_precision=pool,
        )

        kwargs = dict(config.model_kwargs)
        if config.model.endswith("partseg"):
            kwargs.setdefault("num_parts", config.num_classes)
        else:
            kwargs.setdefault("num_classes", config.num_classes)
        kwargs.setdefault("dtype", config.jnp_dtype)
        self.model, self._loss_fn, self.kind = model_zoo.get_model(config.model, **kwargs)
        # Bind the driver's loss-composition flags onto the model's static
        # loss: the reference threads FLAGS.seg_weight into get_loss
        # (pointnet2/train_seg.py:150) and PointNet hard-codes reg_weight
        # 0.001 (pointnet_cls.py:93); each loss only receives the knobs its
        # signature declares.
        import functools
        import inspect

        loss_params = inspect.signature(self._loss_fn).parameters
        loss_overrides = {
            k: getattr(config, k)
            for k in ("seg_weight", "reg_weight")
            if k in loss_params
        }
        if loss_overrides:
            self._loss_fn = functools.partial(self._loss_fn, **loss_overrides)

        self.recipe = (
            model_zoo.get_recipe(config.model) if config.use_model_recipe else None
        )
        if self.recipe is not None and self.recipe.lr_mode == "steps":
            self.lr_schedule = schedules.step_exponential_decay_lr(
                self.recipe.learning_rate_base,
                self.recipe.decay_steps,
                self.recipe.decay_rate,
                self.recipe.learning_rate_min,
            )
        else:
            self.lr_schedule = schedules.exponential_decay_lr(
                config.learning_rate, config.batch_size, config.decay_step, config.decay_rate
            )
        self.bn_schedule = schedules.bn_momentum_schedule(
            config.batch_size, config.decay_step
        )
        adam_eps = 1e-8
        weight_decay = config.weight_decay
        if self.recipe is not None:
            if self.recipe.adam_epsilon is not None:
                adam_eps = self.recipe.adam_epsilon
            if not weight_decay:
                weight_decay = self.recipe.weight_decay
        if config.optimizer == "adam":
            tx = optax.adam(self.lr_schedule, eps=adam_eps)
        elif config.optimizer == "momentum":
            tx = optax.sgd(self.lr_schedule, momentum=config.momentum)
        else:
            raise ValueError(f"unknown optimizer {config.optimizer!r}")
        if weight_decay:
            # L2-in-loss semantics: grad += wd·w fed to the optimizer, exactly
            # tf.losses.get_regularization_loss with l2_regularizer(1.0) ×
            # setting.weight_decay added to the loss (PointCNN/train.py:164).
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        self.tx = tx

        self._batch_shard = mesh_lib.batch_sharding(self.mesh)
        self._repl = mesh_lib.replicated_sharding(self.mesh)

        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,),
            in_shardings=(None, self._batch_shard, None),
            out_shardings=None,
        )
        # The voting rotation matrix is a traced [3,3] input (computed on host
        # in float64) so all vote angles share ONE compiled eval step.
        self._eval_step = jax.jit(
            self._eval_step_impl,
            in_shardings=(None, self._batch_shard, self._repl),
        )
        # Fused-votes eval: ALL vote rotations run in one jitted program
        # (votes stacked into the batch dim, logits summed on-device).  The
        # reference dispatches sess.run once per vote per batch
        # (evaluate_scenennobjects.py:180-196); on this image a host→device
        # round trip is ~25 ms, so a 12-vote eval would spend ~12× the
        # compute time in pure dispatch.  One compiled program per num_votes.
        self._eval_votes = jax.jit(
            self._eval_votes_impl,
            in_shardings=(None, self._batch_shard, self._repl),
        )

    # ------------------------------------------------------------------ setup

    def init_state(self, rng: jax.Array | int = 0) -> TrainState:
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        dummy = jnp.zeros(
            (self.config.batch_size, self.config.num_point, 3), jnp.float32
        )
        variables = self.model.init(
            {"params": rng, "dropout": rng}, dummy, train=False
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
        )
        return jax.device_put(state, self._repl)

    def param_count(self, state: TrainState) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    # ------------------------------------------------------------- train step

    def _augment(self, key: jax.Array, points: jnp.ndarray) -> jnp.ndarray:
        """Train-time augmentation, fused into the step.  Default recipe:
        per-cloud y-rotation + per-point jitter (pointnet2/train.py:246-247).
        PointCNN recipe: in-graph per-cloud xform matmul (rotation y∈[0,π]
        uniform, per-axis gaussian scaling σ=0.1) + jitter, matching
        pointfly.get_xforms/augment (PointCNN/train.py:255-263)."""
        if self.recipe is not None and self.recipe.augment == "pointcnn":
            if not (self.config.augment_rotate or self.config.augment_jitter):
                return points
            return aug.pointcnn_augment(
                key,
                points,
                jitter_range=self.recipe.jitter,
                rotation_range=self.recipe.rotation_range,
                scaling_range=self.recipe.scaling_range,
            )
        k1, k2 = jax.random.split(key)
        if self.config.augment_rotate:
            points = aug.rotate_point_cloud(k1, points)
        if self.config.augment_jitter:
            points = aug.jitter_point_cloud(k2, points)
        return points

    def _compute_metrics(self, outputs, batch) -> dict:
        metrics = {}
        if "logits" in outputs:
            pred = jnp.argmax(outputs["logits"], axis=-1)
            metrics["correct"] = jnp.sum(pred == batch["labels"])
            metrics["count"] = jnp.asarray(pred.shape[0], jnp.int32)
        if "seg_logits" in outputs and ("masks" in batch or "parts" in batch):
            target = batch.get("masks", batch.get("parts"))
            seg_pred = jnp.argmax(outputs["seg_logits"], axis=-1)
            metrics["seg_correct"] = jnp.sum(seg_pred == target)
            metrics["seg_count"] = jnp.asarray(seg_pred.size, jnp.int32)
        return metrics

    def _train_step_impl(self, state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        aug_rng, dropout_rng = jax.random.split(step_rng)
        batch = dict(batch)
        batch["points"] = self._augment(aug_rng, batch["points"].astype(jnp.float32))
        bn_momentum = self.bn_schedule(state.step)

        def loss_fn(params):
            outputs, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"],
                train=True,
                bn_momentum=bn_momentum,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss, metrics = self._loss_fn(outputs, batch)
            return loss, (metrics, mutated["batch_stats"], outputs)

        grads, (metrics, new_stats, outputs) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {**metrics, **self._compute_metrics(outputs, batch)}
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, batch: dict, rot: jnp.ndarray):
        points = batch["points"].astype(jnp.float32)
        points = jnp.einsum(
            "bnc,cd->bnd", points, rot, precision=jax.lax.Precision.HIGHEST
        )
        outputs = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=False,
        )
        loss, metrics = self._loss_fn(outputs, batch)
        out = {"loss": loss, **{k: v for k, v in outputs.items() if k != "end_points"}}
        out.update(self._compute_metrics(outputs, batch))
        return out

    def _eval_votes_impl(self, state: TrainState, batch: dict, rots: jnp.ndarray):
        """All-votes eval in ONE program: rotate the batch by every vote
        matrix ([V, 3, 3]), run the model once on the [V·B] stacked batch
        (train=False — BN stats fixed, so stacking changes no numerics),
        and sum logits over votes on-device.  Per-vote losses average to
        the same value the per-vote host loop accumulates."""
        points = batch["points"].astype(jnp.float32)
        v = rots.shape[0]
        b, n, _ = points.shape
        pts = jnp.einsum(
            "bnc,vcd->vbnd", points, rots, precision=jax.lax.Precision.HIGHEST
        ).reshape(v * b, n, 3)
        outputs = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts,
            train=False,
        )
        # Loss per vote, then averaged — NOT the stacked-batch mean: losses
        # with sum reductions (PointNet's mat_diff penalty) would read V×
        # too large on a [V·B] batch.  Matches the host loop's
        # Σ_v loss_v / V exactly.
        outputs_v = jax.tree_util.tree_map(
            lambda x: x.reshape((v, b) + x.shape[1:]), outputs
        )
        loss = jnp.mean(
            jax.vmap(lambda o: self._loss_fn(o, batch)[0])(outputs_v)
        )
        out = {"loss": loss}
        if "logits" in outputs:
            out["logits_sum"] = jnp.sum(
                outputs["logits"].astype(jnp.float32).reshape(v, b, -1), axis=0
            )
        if "seg_logits" in outputs:
            sl = outputs["seg_logits"].astype(jnp.float32)
            out["seg_logits_sum"] = jnp.sum(
                sl.reshape(v, b, *sl.shape[1:]), axis=0
            )
        return out

    # ------------------------------------------------------------ public API

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array):
        batch = mesh_lib.shard_batch(self._as_device_batch(batch), self.mesh)
        return self._train_step(state, batch, rng)

    def eval_step(self, state: TrainState, batch: dict, rotate_angle: float = 0.0):
        batch = mesh_lib.shard_batch(self._as_device_batch(batch), self.mesh)
        c, s = np.cos(float(rotate_angle)), np.sin(float(rotate_angle))
        rot = jnp.asarray(
            [[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], jnp.float32
        )
        return self._eval_step(state, batch, rot)

    @staticmethod
    def _vote_rotations(num_votes: int) -> jnp.ndarray:
        """The voting protocol's y-rotation matrices [V, 3, 3]: uniformly
        spaced angles 2π·v/V (evaluate_scenennobjects.py:180-181), each
        matrix identical to the single-angle eval_step's."""
        angles = 2.0 * np.pi * np.arange(num_votes) / float(num_votes)
        c, s = np.cos(angles), np.sin(angles)
        zero, one = np.zeros_like(c), np.ones_like(c)
        mats = np.stack(
            [
                np.stack([c, zero, s], axis=-1),
                np.stack([zero, one, zero], axis=-1),
                np.stack([-s, zero, c], axis=-1),
            ],
            axis=-2,
        )
        return jnp.asarray(mats, jnp.float32)

    def eval_votes(self, state: TrainState, batch: dict, num_votes: int = 1):
        """Fused voting eval: every vote rotation in one device program.
        Returns {'loss', 'logits_sum'[, 'seg_logits_sum']}."""
        batch = mesh_lib.shard_batch(self._as_device_batch(batch), self.mesh)
        rots = jax.device_put(self._vote_rotations(num_votes), self._repl)
        return self._eval_votes(state, batch, rots)

    def _as_device_batch(self, batch: dict) -> dict:
        out = {"points": jnp.asarray(batch["points"], jnp.float32)}
        if "labels" in batch:
            out["labels"] = jnp.asarray(batch["labels"], jnp.int32)
        if "masks" in batch:
            out["masks"] = jnp.asarray(batch["masks"], jnp.int32)
        if "parts" in batch:
            out["parts"] = jnp.asarray(batch["parts"], jnp.int32)
        return out

    # --------------------------------------------------- device-resident epochs

    def upload_dataset(self, data: dict) -> dict:
        """Place a full (small) dataset in device HBM, replicated, for the
        whole-epoch-in-one-jit fast path.  ScanObjectNN is ~300 MB at
        2048 pts — resident is the TPU-native answer to the reference's
        per-batch feed_dict uploads."""
        out = {"points": jax.device_put(jnp.asarray(data["points"], jnp.float32), self._repl)}
        out["labels"] = jax.device_put(jnp.asarray(data["labels"], jnp.int32), self._repl)
        for k in ("masks", "parts"):
            if data.get(k) is not None:
                out[k] = jax.device_put(jnp.asarray(data[k], jnp.int32), self._repl)
        return out

    def _epoch_impl(self, state: TrainState, data: dict, rng: jax.Array):
        """One full training epoch as a single XLA program: on-device
        per-epoch point permutation (shared across clouds, matching
        data_utils.py:171-186), cloud-order shuffle, and a fori_loop over
        batches with on-device metric accumulation."""
        cfg = self.config
        n_total = data["labels"].shape[0]
        n_batches = n_total // cfg.batch_size
        # Distinct stream from the per-step keys: fold_in(rng, state.step)
        # alone would be bit-identical to the FIRST batch's step_rng in
        # _train_step_impl (same split → epoch point-permutation key ==
        # first batch's augmentation key every epoch).
        epoch_key = jax.random.fold_in(
            jax.random.fold_in(rng, 0xE70C), state.step
        )
        k_pts, k_order = jax.random.split(epoch_key)
        pt_perm = jax.random.permutation(k_pts, data["points"].shape[1])[: cfg.num_point]
        order = jax.random.permutation(k_order, n_total)

        view = {"points": data["points"][order][:, pt_perm, :]}
        view["labels"] = data["labels"][order]
        if "masks" in data:
            view["masks"] = data["masks"][order][:, pt_perm]
        if "parts" in data:
            view["parts"] = data["parts"][order][:, pt_perm]

        def body(i, carry):
            state, sums = carry
            batch = {
                k: jax.lax.dynamic_slice_in_dim(v, i * cfg.batch_size, cfg.batch_size)
                for k, v in view.items()
            }
            # Batch-shard each sliced batch over the 'data' axis so the train
            # step (the expensive part) runs data-parallel on a multi-chip
            # mesh — the dataset itself stays replicated (it is small and the
            # per-epoch view shuffle is cheap), but without this constraint
            # GSPMD would compute every step fully replicated.
            batch = {
                k: jax.lax.with_sharding_constraint(v, self._batch_shard)
                for k, v in batch.items()
            }
            state, metrics = self._train_step_impl(state, batch, rng)
            sums = {k: sums[k] + metrics[k].astype(jnp.float32) for k in sums}
            return state, sums

        zero_metrics = jax.eval_shape(
            lambda s: self._train_step_impl(
                s, {k: v[: cfg.batch_size] for k, v in view.items()}, rng
            )[1],
            state,
        )
        sums0 = {k: jnp.zeros((), jnp.float32) for k in zero_metrics}
        state, sums = jax.lax.fori_loop(0, n_batches, body, (state, sums0))
        return state, sums, jnp.asarray(n_batches, jnp.float32)

    def train_epoch_device(self, state: TrainState, device_data: dict, rng: jax.Array):
        """Fast path: the whole epoch is one jitted program over the
        HBM-resident dataset — no host↔device traffic per step.  Epoch
        shuffling uses jax RNG (statistically equivalent to, not bit-equal
        with, the host EpochSampler's numpy shuffles)."""
        if not hasattr(self, "_epoch_jit"):
            self._epoch_jit = jax.jit(self._epoch_impl, donate_argnums=(0,))
        state, sums, n_batches = self._epoch_jit(state, device_data, rng)
        nb = float(n_batches)
        summary = {"mean_loss": float(sums.get("loss", 0.0)) / max(nb, 1.0)}
        if "correct" in sums:
            summary["accuracy"] = float(sums["correct"]) / max(float(sums["count"]), 1.0)
        if "seg_correct" in sums:
            summary["seg_accuracy"] = float(sums["seg_correct"]) / max(
                float(sums["seg_count"]), 1.0
            )
        return state, summary

    def train_epoch(self, state: TrainState, sampler: EpochSampler, rng: jax.Array):
        view = sampler.epoch()
        totals: dict[str, float] = {}
        n_batches = 0
        for batch in Batches(view, self.config.batch_size):
            state, metrics = self.train_step(state, batch, rng)
            n_batches += 1
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        summary = {
            "mean_loss": totals.get("loss", 0.0) / max(n_batches, 1),
        }
        if "correct" in totals:
            summary["accuracy"] = totals["correct"] / max(totals.get("count", 1), 1)
        if "seg_correct" in totals:
            summary["seg_accuracy"] = totals["seg_correct"] / max(totals.get("seg_count", 1), 1)
        return state, summary

    def _eval_epoch_impl(
        self, state: TrainState, data: dict, rots: jnp.ndarray, rng: jax.Array
    ):
        """One full voting evaluation as a single XLA program: on-device
        point subsample, a fori_loop over padded batches (remainder rows
        repeat the last sample, masked out of every tally — the host
        ``evaluate`` protocol), per-batch all-votes logits sums, and
        on-device accuracy/per-class/seg accumulation."""
        cfg = self.config
        n_total = data["labels"].shape[0]
        bsz = cfg.batch_size
        n_batches = -(-n_total // bsz)
        num_classes = cfg.num_classes

        n_pts = data["points"].shape[1]
        if cfg.num_point < n_pts:
            if rng is None:  # shuffle=False: first num_point points, the
                pt_perm = jnp.arange(cfg.num_point)  # host protocol exactly
            else:
                pt_perm = jax.random.permutation(rng, n_pts)[: cfg.num_point]
        else:
            pt_perm = jnp.arange(n_pts)
        view = {"points": data["points"][:, pt_perm, :], "labels": data["labels"]}
        for k in ("masks", "parts"):
            if k in data:
                view[k] = data[k][:, pt_perm]

        sums0 = {
            "loss_sum": jnp.zeros((), jnp.float32),
            "correct": jnp.zeros((), jnp.float32),
            "seen_class": jnp.zeros((num_classes,), jnp.float32),
            "correct_class": jnp.zeros((num_classes,), jnp.float32),
            "seg_correct": jnp.zeros((), jnp.float32),
            "seg_count": jnp.zeros((), jnp.float32),
        }
        if "parts" in view:
            # Per-part-id point tallies (evaluate_partseg.py:166-185); the
            # part-id space is the seg head's width.
            out_sh = jax.eval_shape(
                self._eval_votes_impl,
                state,
                {k: v[:bsz] for k, v in view.items()},
                rots,
            )
            if "seg_logits_sum" in out_sh:
                num_parts = out_sh["seg_logits_sum"].shape[-1]
                sums0["part_seen"] = jnp.zeros((num_parts,), jnp.float32)
                sums0["part_correct"] = jnp.zeros((num_parts,), jnp.float32)
        preds0 = jnp.zeros((n_batches * bsz,), jnp.int32)

        def body(i, carry):
            sums, preds = carry
            gidx = i * bsz + jnp.arange(bsz)
            valid = gidx < n_total  # [B]
            take = jnp.clip(gidx, 0, n_total - 1)  # pad = repeat last sample
            batch = {k: jnp.take(v, take, axis=0) for k, v in view.items()}
            batch = {
                k: jax.lax.with_sharding_constraint(v, self._batch_shard)
                for k, v in batch.items()
            }
            out = self._eval_votes_impl(state, batch, rots)
            validf = valid.astype(jnp.float32)
            nvalid = jnp.sum(validf)
            sums = dict(sums)
            # Host-protocol loss: padded-batch mean × valid rows.
            sums["loss_sum"] = sums["loss_sum"] + out["loss"] * nvalid
            if "logits_sum" in out:
                pred = jnp.argmax(out["logits_sum"], axis=1).astype(jnp.int32)
                hit = ((pred == batch["labels"]) & valid).astype(jnp.float32)
                sums["correct"] = sums["correct"] + jnp.sum(hit)
                onehot_l = (
                    jax.nn.one_hot(batch["labels"], num_classes)
                    * validf[:, None]
                )
                sums["seen_class"] = sums["seen_class"] + jnp.sum(onehot_l, axis=0)
                sums["correct_class"] = sums["correct_class"] + jnp.sum(
                    onehot_l * hit[:, None], axis=0
                )
                preds = jax.lax.dynamic_update_slice_in_dim(
                    preds, pred, i * bsz, axis=0
                )
            if "seg_logits_sum" in out:
                target = batch.get("masks", batch.get("parts"))
                if target is not None:
                    seg_pred = jnp.argmax(out["seg_logits_sum"], axis=-1)
                    seg_hit = (seg_pred == target) & valid[:, None]
                    sums["seg_correct"] = sums["seg_correct"] + jnp.sum(
                        seg_hit.astype(jnp.float32)
                    )
                    sums["seg_count"] = sums["seg_count"] + nvalid * target.shape[1]
                    if "part_seen" in sums:
                        np_ = sums["part_seen"].shape[0]
                        oh = jax.nn.one_hot(target, np_) * validf[:, None, None]
                        sums["part_seen"] = sums["part_seen"] + jnp.sum(
                            oh, axis=(0, 1)
                        )
                        sums["part_correct"] = sums["part_correct"] + jnp.sum(
                            oh * seg_hit.astype(jnp.float32)[:, :, None],
                            axis=(0, 1),
                        )
            return sums, preds

        sums, preds = jax.lax.fori_loop(0, n_batches, body, (sums0, preds0))
        return sums, preds

    def evaluate_device(
        self,
        state: TrainState,
        device_data: dict,
        num_votes: int = 1,
        seed: int | None = 0,
        shuffle: bool = True,
    ) -> dict:
        """Device-resident voting evaluation: the ENTIRE protocol — point
        subsample, batching with remainder padding, all vote rotations,
        accuracy/per-class/seg tallies — runs as one jitted program over an
        HBM-resident dataset (``upload_dataset``).  The host ``evaluate``
        loop pays a ~30-60 ms dispatch per batch (this image's round-trip
        floor), which dominates its wall clock; this path removes it.

        Numerics: with ``shuffle=False`` the point subsample is the first
        ``num_point`` points — EXACTLY ``evaluate(..., shuffle=False)``
        (tested, including when num_point == the stored point count); with
        ``shuffle=True`` the point choice uses jax RNG — statistically
        equivalent to, not bit-equal with, the host EpochSampler's numpy
        choice (the train_epoch_device convention).  Per-part tables
        (partseg) are tallied on-device; keep_points dumps stay on the
        host path."""
        if not hasattr(self, "_eval_epoch_jit"):
            self._eval_epoch_jit = jax.jit(self._eval_epoch_impl)
        rots = jax.device_put(self._vote_rotations(num_votes), self._repl)
        rng = None
        if shuffle:
            # seed=None mirrors the host evaluate: a FRESH subsample per
            # call (global numpy stream), not a pinned key.
            rng = jax.random.PRNGKey(
                np.random.randint(0, 2**31 - 1) if seed is None else seed
            )
        sums, preds = jax.device_get(
            self._eval_epoch_jit(state, device_data, rots, rng)
        )  # ONE host transfer — per-scalar readbacks pay ~25 ms each here
        n_total = int(device_data["labels"].shape[0])
        results: dict[str, Any] = {
            "total_seen": n_total,
            "mean_loss": float(sums["loss_sum"]) / max(n_total, 1),
        }
        seen_class = np.asarray(sums["seen_class"], np.float64)
        if seen_class.sum() > 0:
            results["accuracy"] = float(sums["correct"]) / n_total
            with np.errstate(divide="ignore", invalid="ignore"):
                per_class = np.where(
                    seen_class > 0,
                    np.asarray(sums["correct_class"], np.float64)
                    / np.maximum(seen_class, 1),
                    np.nan,
                )
            results["avg_class_accuracy"] = float(np.nanmean(per_class))
            results["per_class_accuracy"] = per_class
            results["predictions"] = np.asarray(preds)[:n_total]
            results["labels"] = np.asarray(device_data["labels"])[:n_total]
        if float(sums["seg_count"]) > 0:
            results["seg_accuracy"] = float(sums["seg_correct"]) / float(
                sums["seg_count"]
            )
        if "part_seen" in sums:
            part_seen = np.asarray(sums["part_seen"], np.float64)
            part_correct = np.asarray(sums["part_correct"], np.float64)
            # -1.0 marks unseen parts; avg over seen parts only (the host
            # evaluate / evaluate_partseg.py:177-185 convention).
            with np.errstate(divide="ignore", invalid="ignore"):
                per_part = np.where(
                    part_seen > 0, part_correct / np.maximum(part_seen, 1), -1.0
                )
            results["per_part_accuracy"] = per_part
            seen = part_seen > 0
            results["avg_part_accuracy"] = (
                float(per_part[seen].mean()) if seen.any() else 0.0
            )
        return results

    def evaluate_auto(
        self,
        state: TrainState,
        data,
        labels,
        masks=None,
        parts=None,
        num_votes: int = 1,
        shuffle: bool = True,
        seed: int | None = 0,
        keep_points: bool = False,
    ) -> dict:
        """Route one voting evaluation to the right engine: the
        device-resident program (evaluate_device) for dense input, the host
        loop for ragged input or keep_points dumps.  The single dispatch
        point for the CLI, fit, and the cross-domain drivers."""
        from scanobjectnn_tpu.data.pipeline import is_ragged

        if keep_points or is_ragged(data):
            return self.evaluate(
                state, data, labels, masks=masks, parts=parts,
                num_votes=num_votes, shuffle=shuffle, seed=seed,
                keep_points=keep_points,
            )
        dd = {"points": data, "labels": labels}
        if masks is not None:
            dd["masks"] = masks
        if parts is not None:
            dd["parts"] = parts
        return self.evaluate_device(
            state, self.upload_dataset(dd),
            num_votes=num_votes, shuffle=shuffle, seed=seed,
        )

    def evaluate(
        self,
        state: TrainState,
        data: np.ndarray,
        labels: np.ndarray,
        masks: np.ndarray | None = None,
        parts: np.ndarray | None = None,
        num_votes: int = 1,
        shuffle: bool = True,
        seed: int | None = 0,
        keep_points: bool = False,
    ) -> dict:
        """Voting evaluation (evaluate_scenennobjects.py:152-231): per batch,
        sum logits over ``num_votes`` uniformly spaced y-rotations, argmax,
        tally overall + per-class (+ seg) accuracy.

        No sample is dropped: the final partial batch is padded (repeating
        its last row) and padded rows are masked out of every accuracy tally,
        so ``total_seen == len(data)`` at any batch size — matching the
        reference's BATCH_SIZE=1 protocol exactly for accuracies.  The one
        approximation: the padded batch's loss contribution uses the padded
        batch mean (loss is informational; exact at batch_size 1)."""
        cfg = self.config
        sampler = EpochSampler(
            data, labels, masks=masks, parts=parts,
            num_points=cfg.num_point, shuffle=shuffle, seed=seed,
        )
        view = sampler.epoch()
        num_classes = cfg.num_classes
        total_seen = 0
        total_correct = 0
        loss_sum = 0.0
        seen_class = np.zeros(num_classes, np.int64)
        correct_class = np.zeros(num_classes, np.int64)
        seg_correct = 0
        seg_seen = 0
        part_seen = None  # per-part-id point tallies (evaluate_partseg.py:166-185)
        part_correct = None
        all_pred = []
        all_label = []
        all_seg_pred = []
        from scanobjectnn_tpu.data.pipeline import padded_batches

        for batch, valid in padded_batches(view, cfg.batch_size):
            # ONE device program per batch covers all votes (rotations
            # stacked into the batch dim, logits summed on-device) — the
            # host loop over votes cost ~25 ms dispatch per vote per batch.
            out = self.eval_votes(state, batch, num_votes=num_votes)
            pred_sum = (
                np.asarray(out["logits_sum"], np.float32)[:valid]
                if "logits_sum" in out
                else np.zeros((valid, num_classes), np.float32)
            )
            seg_logits_sum = (
                np.asarray(out["seg_logits_sum"], np.float32)[:valid]
                if "seg_logits_sum" in out
                else None
            )
            loss_sum += float(out["loss"]) * valid
            if "logits_sum" in out:
                pred = np.argmax(pred_sum, axis=1)
                labels_np = np.asarray(batch["labels"])[:valid]
                total_correct += int((pred == labels_np).sum())
                for p, l in zip(pred, labels_np):
                    seen_class[l] += 1
                    correct_class[l] += int(p == l)
                all_pred.append(pred)
                all_label.append(labels_np)
            if seg_logits_sum is not None:
                seg_pred = np.argmax(seg_logits_sum, axis=-1)
                if keep_points:
                    all_seg_pred.append(seg_pred)
                target = batch.get("masks", batch.get("parts"))
                if target is not None:
                    target = np.asarray(target)[:valid]
                    seg_correct += int((seg_pred == target).sum())
                    seg_seen += seg_pred.size
                    if "parts" in batch:
                        # Per-part-id point accuracy table
                        # (pointnet/evaluate_partseg.py:166-185).
                        num_parts = seg_logits_sum.shape[-1]
                        if part_seen is None:
                            part_seen = np.zeros(num_parts, np.int64)
                            part_correct = np.zeros(num_parts, np.int64)
                        flat_t = target.reshape(-1)
                        hit = (seg_pred == target).reshape(-1)
                        part_seen += np.bincount(flat_t, minlength=num_parts)
                        part_correct += np.bincount(
                            flat_t, weights=hit, minlength=num_parts
                        ).astype(np.int64)
            total_seen += valid

        results: dict[str, Any] = {
            "total_seen": total_seen,
            "mean_loss": loss_sum / max(total_seen, 1),
        }
        if total_seen and seen_class.sum() > 0:
            results["accuracy"] = total_correct / total_seen
            with np.errstate(divide="ignore", invalid="ignore"):
                per_class = np.where(
                    seen_class > 0, correct_class / np.maximum(seen_class, 1), np.nan
                )
            results["avg_class_accuracy"] = float(np.nanmean(per_class))
            results["per_class_accuracy"] = per_class
            results["predictions"] = np.concatenate(all_pred) if all_pred else np.array([])
            results["labels"] = np.concatenate(all_label) if all_label else np.array([])
        if seg_seen:
            results["seg_accuracy"] = seg_correct / seg_seen
        if part_seen is not None:
            # -1.0 marks unseen parts, matching the reference table; avg is
            # over seen parts only (evaluate_partseg.py:177-185).
            with np.errstate(divide="ignore", invalid="ignore"):
                per_part = np.where(
                    part_seen > 0, part_correct / np.maximum(part_seen, 1), -1.0
                )
            results["per_part_accuracy"] = per_part
            seen = part_seen > 0
            results["avg_part_accuracy"] = (
                float(per_part[seen].mean()) if seen.any() else 0.0
            )
        if keep_points:
            # The evaluated samples in eval order (for error-case dumps) —
            # every sample is evaluated now (remainder padded, not dropped).
            results["points"] = view["points"]
            if "masks" in view:
                results["masks"] = view["masks"]
            if all_seg_pred:
                results["seg_predictions"] = np.concatenate(all_seg_pred)
        return results

    # ------------------------------------------------------------------- fit

    def fit(
        self,
        train_data: dict,
        test_data: dict | None = None,
        state: TrainState | None = None,
        num_votes: int = 1,
        resume: bool = False,
    ) -> TrainState:
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)
        resumed = False
        if state is None:
            state = self.init_state(rng)
            if resume and cfg.log_dir:
                restored = self.restore(state)
                if restored is not None:
                    state, resumed = restored, True
        self.logger.log(
            f"model={cfg.model} params={self.param_count(state):,} "
            f"devices={len(self.mesh.devices.flatten())}"
        )
        if self.recipe is not None:
            self.logger.log(f"recipe={self.recipe}")
        if cfg.log_dir:
            self.snapshot_sources()
        ragged = isinstance(train_data["points"], (list, tuple)) or (
            isinstance(train_data["points"], np.ndarray)
            and train_data["points"].dtype == object
        )
        if cfg.device_resident and not ragged:
            device_data = self.upload_dataset(train_data)
            sampler = None
        else:
            sampler = EpochSampler(
                train_data["points"], train_data["labels"],
                masks=train_data.get("masks"), parts=train_data.get("parts"),
                num_points=cfg.num_point, seed=cfg.seed,
            )
        # Device-resident per-epoch eval for dense test sets (uploaded ONCE,
        # reused every epoch): the host loop's ~30-60 ms dispatch per batch
        # dominates eval wall otherwise.
        from scanobjectnn_tpu.data.pipeline import is_ragged

        device_test = None
        if (
            test_data is not None
            and cfg.device_resident
            and not is_ragged(test_data["points"])
        ):
            device_test = self.upload_dataset(test_data)
        best_acc = -1.0  # best-so-far tracking (3DmFV-Net/train.py:232-237)
        best_avg_cls = -1.0
        start_epoch = 0
        if resumed:
            # Pick up the best-so-far + epoch counter from the sidecars so a
            # restarted run neither clobbers checkpoint_best with a worse
            # state nor re-trains completed epochs.
            bj = self._load_sidecar("best.json")
            best_acc = float(bj.get("accuracy", best_acc))
            best_avg_cls = float(bj.get("avg_class_accuracy", best_avg_cls))
            lj = self._load_sidecar("last.json")
            start_epoch = int(lj.get("epoch", -1)) + 1
            self.logger.log(
                f"resumed at epoch {start_epoch} (best_acc={best_acc:.4f})"
            )
        for epoch in range(start_epoch, cfg.max_epoch):
            t0 = time.time()
            if sampler is None:
                state, summary = self.train_epoch_device(state, device_data, rng)
            else:
                state, summary = self.train_epoch(state, sampler, rng)
            msg = f"epoch {epoch:03d} " + " ".join(
                f"{k}={v:.4f}" for k, v in summary.items()
            )
            self.logger.log(f"{msg} ({time.time() - t0:.1f}s)")
            scalars = {f"train_{k}": v for k, v in summary.items()}
            if test_data is not None:
                t_ev = time.time()
                if device_test is not None:
                    ev = self.evaluate_device(
                        state, device_test, num_votes=num_votes
                    )
                else:
                    ev = self.evaluate(
                        state, test_data["points"], test_data["labels"],
                        masks=test_data.get("masks"), parts=test_data.get("parts"),
                        num_votes=num_votes,
                    )
                scalars["eval_seconds"] = time.time() - t_ev
                self.logger.log(
                    "  eval "
                    + " ".join(
                        f"{k}={v:.4f}"
                        for k, v in ev.items()
                        if isinstance(v, (int, float))
                    )
                )
                scalars.update(
                    {f"eval_{k}": v for k, v in ev.items() if isinstance(v, (int, float))}
                )
                acc = ev.get("accuracy", ev.get("seg_accuracy", -1.0))
                if acc > best_acc:
                    best_acc = acc
                    best_avg_cls = ev.get("avg_class_accuracy", -1.0)
                    if cfg.log_dir:
                        self.save(state, best=True, meta={
                            "accuracy": float(best_acc),
                            "avg_class_accuracy": float(best_avg_cls),
                        })
                scalars["best_accuracy"] = best_acc
            self.logger.scalars(int(state.step), epoch=epoch, **scalars)
            if cfg.log_dir and (epoch + 1) % cfg.checkpoint_every == 0:
                self.save(state, meta={"epoch": epoch})
        if test_data is not None:
            self.logger.log(f"Best test accuracy: {best_acc:f}")
            if best_avg_cls >= 0:  # partseg has no per-class cls accuracy
                self.logger.log(f"Best test class accuracy: {best_avg_cls:f}")
        return state

    # ------------------------------------------------------------ checkpoints

    def _ckpt_dir(self, best: bool = False) -> str:
        assert self.config.log_dir
        name = "checkpoint_best" if best else "checkpoint"
        return os.path.join(os.path.abspath(self.config.log_dir), name)

    def save(
        self, state: TrainState, best: bool = False, meta: dict | None = None
    ) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(best=best)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(os.path.dirname(path), "config.json"), "w") as f:
            json.dump(
                {k: v for k, v in self.config.__dict__.items() if not callable(v)},
                f, default=str, indent=2,
            )
        # Sidecar metadata so --resume can pick up where it left off:
        # best.json carries the best-so-far accuracy (otherwise the first
        # post-resume epoch would clobber checkpoint_best), last.json the
        # epoch counter.
        sidecar = "best.json" if best else "last.json"
        with open(os.path.join(os.path.dirname(path), sidecar), "w") as f:
            json.dump({"step": int(state.step), **(meta or {})}, f)

    def _load_sidecar(self, name: str) -> dict:
        path = os.path.join(os.path.abspath(self.config.log_dir), name)
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def snapshot_sources(self) -> None:
        """Copy the model's source module (+ this trainer) into the log dir,
        mirroring the reference's reproducibility snapshot
        (pointnet2/train.py:72-74 cp's MODEL_FILE and train.py to LOG_DIR)."""
        import inspect
        import shutil

        dst = os.path.join(os.path.abspath(self.config.log_dir), "src_snapshot")
        os.makedirs(dst, exist_ok=True)
        for obj in (type(self.model), Trainer):
            try:
                src = inspect.getsourcefile(obj)
            except TypeError:
                continue
            if src and os.path.isfile(src):
                shutil.copy2(src, dst)

    def restore(self, template: TrainState, best: bool = False) -> TrainState | None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(best=best)
        if not os.path.isdir(path):
            return None
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, jax.device_get(template))
        return jax.device_put(restored, self._repl)
