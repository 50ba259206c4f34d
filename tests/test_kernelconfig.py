"""The central kernel-dispatch configuration (scanobjectnn_tpu.kernelconfig).

Round-4 VERDICT item 6: every numerics-affecting kernel option must be
reachable from TrainerConfig/CLI, with the SCANOBJECTNN_* env vars demoted
to explicit overrides.  These tests pin (a) the precedence order
env > active config > default, (b) the CLI→TrainerConfig→kernelconfig
plumbing, and (c) the headline user-facing behavior: a bf16 CLI train
dispatches exact-key pooling (the validated fix for the bf16 max-pool
training collapse, SYNTH_HARD.md) without any env var.
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanobjectnn_tpu import kernelconfig


@pytest.fixture(autouse=True)
def _reset_kernelconfig(monkeypatch):
    """Isolate the process-global config and the override env vars."""
    for var in (
        "SCANOBJECTNN_OPS_BACKEND",
        "SCANOBJECTNN_FUSED_SA_EVAL",
        "SCANOBJECTNN_FUSED_SA_TRAIN",
        "SCANOBJECTNN_SA_BUCKET",
        "SCANOBJECTNN_SA_POOL_F32",
    ):
        monkeypatch.delenv(var, raising=False)
    old = kernelconfig.active()
    yield
    kernelconfig._active = old


def test_defaults():
    kernelconfig._active = kernelconfig.KernelConfig()
    assert kernelconfig.ops_backend() == "auto"
    assert kernelconfig.fused_sa_eval() == "on"
    assert kernelconfig.fused_sa_train() is False
    assert kernelconfig.sa_bucket() == "auto"
    assert kernelconfig.pool_mode() == "0"


def test_set_and_validation():
    cfg = kernelconfig.set_kernel_config(
        ops_backend="lax", fused_sa_eval="off", fused_sa_train=True,
        sa_bucket="896,64,128", pool_precision="keys",
    )
    assert cfg.ops_backend == "lax"
    assert kernelconfig.ops_backend() == "lax"
    assert kernelconfig.fused_sa_eval() == "off"
    assert kernelconfig.fused_sa_train() is True
    assert kernelconfig.sa_bucket() == (896, 64, 128)
    assert kernelconfig.pool_mode() == "keys"
    with pytest.raises(ValueError):
        kernelconfig.set_kernel_config(ops_backend="cuda")
    with pytest.raises(ValueError):
        kernelconfig.set_kernel_config(sa_bucket="please")
    with pytest.raises(ValueError):
        kernelconfig.set_kernel_config(pool_precision="f64")


def test_env_overrides_config(monkeypatch):
    kernelconfig.set_kernel_config(
        ops_backend="pallas", fused_sa_eval="on", fused_sa_train=True,
        sa_bucket="auto", pool_precision="keys",
    )
    monkeypatch.setenv("SCANOBJECTNN_OPS_BACKEND", "lax")
    monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "0")
    monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_TRAIN", "0")
    monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", "off")
    monkeypatch.setenv("SCANOBJECTNN_SA_POOL_F32", "1")
    assert kernelconfig.ops_backend() == "lax"
    assert kernelconfig.fused_sa_eval() == "off"
    assert kernelconfig.fused_sa_train() is False
    assert kernelconfig.sa_bucket() is None
    assert kernelconfig.pool_mode() == "1"


def test_trainer_applies_and_resolves_auto_pool():
    from scanobjectnn_tpu.train import Trainer, TrainerConfig

    base = dict(model="pointnet_cls_basic", num_classes=3, num_point=48,
                batch_size=8)
    Trainer(TrainerConfig(**base, dtype="bfloat16"))
    assert kernelconfig.pool_mode() == "keys"
    Trainer(TrainerConfig(**base, dtype="float32"))
    assert kernelconfig.pool_mode() == "0"
    Trainer(TrainerConfig(**base, ops_backend="lax", sa_bucket="off",
                          pool_precision="f32"))
    assert kernelconfig.ops_backend() == "lax"
    assert kernelconfig.sa_bucket() is None
    assert kernelconfig.pool_mode() == "1"


def _cli_trainer(extra, mode="cls"):
    from scanobjectnn_tpu.train import cli as cli_mod

    p = argparse.ArgumentParser()
    cli_mod._add_common_flags(p)
    args = p.parse_args([
        "--model", "pointnet2_cls_ssg", "--num_class", "3",
        "--num_point", "48", "--batch_size", "8", "--log_dir", "",
        *extra,
    ])
    return cli_mod._make_trainer(args, mode)


def test_cli_flags_reach_kernelconfig():
    _cli_trainer([
        "--ops_backend", "lax", "--fused_sa_eval", "interpret",
        "--fused_sa_train", "--sa_bucket", "640,32,128",
        "--pool_precision", "keys",
    ])
    assert kernelconfig.ops_backend() == "lax"
    assert kernelconfig.fused_sa_eval() == "interpret"
    assert kernelconfig.fused_sa_train() is True
    assert kernelconfig.sa_bucket() == (640, 32, 128)
    assert kernelconfig.pool_mode() == "keys"


def test_bf16_cli_train_dispatches_exactpool(monkeypatch):
    """`train --dtype bfloat16` must route the SA max-pools through the
    exact-key pooling machinery with NO env var — the round-4 verdict's
    headline complaint was that the validated bf16-collapse fix was
    invisible.  The final Dense→BN→relu→pool layers dispatch the FUSED op
    (dense_bn_exactkey_pool, round 5); Dense-less final layers
    (LiftedGroupMLP layer 0) keep the unfused exact_key_max_pool."""
    from scanobjectnn_tpu.ops import exactpool

    calls = []
    fused_calls = []
    real = exactpool.exact_key_max_pool
    real_fused = exactpool.dense_bn_exactkey_pool

    def spy(y, key, axis):
        calls.append((y.dtype, key.dtype))
        return real(y, key, axis)

    def spy_fused(x, *args, **kw):
        fused_calls.append(x.dtype)
        return real_fused(x, *args, **kw)

    monkeypatch.setattr(exactpool, "exact_key_max_pool", spy)
    monkeypatch.setattr(exactpool, "dense_bn_exactkey_pool", spy_fused)

    trainer = _cli_trainer(["--dtype", "bfloat16"])
    assert kernelconfig.pool_mode() == "keys"
    state = trainer.init_state(0)
    rng = np.random.RandomState(0)
    batch = {
        "points": rng.randn(8, 48, 3).astype(np.float32),
        "labels": rng.randint(0, 3, 8).astype(np.int32),
    }
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert fused_calls or calls, (
        "no exact-key pool dispatched under bf16 train"
    )
    # SSG's SA stacks all end in a Dense-owning final layer → fused op.
    assert fused_calls, "fused dense_bn_exactkey_pool was not dispatched"
    for x_dt in fused_calls:
        assert x_dt == jnp.bfloat16  # value chain stays in compute dtype
    for y_dt, key_dt in calls:
        assert y_dt == jnp.bfloat16
        assert key_dt == jnp.float32  # f32 keys decide winners/ties

    # The same trainer under f32 must NOT dispatch either path.
    calls.clear()
    fused_calls.clear()
    trainer32 = _cli_trainer([])
    state32 = trainer32.init_state(0)
    trainer32.train_step(state32, batch, jax.random.PRNGKey(0))
    assert not calls and not fused_calls
