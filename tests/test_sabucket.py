"""Parity tests for the spatially-bucketed fused SA kernel
(ops/pallas/sabucket_kernel.py).

The bucketed kernel's contract is BIT-EXACT pooled output vs the full
fused kernel (safused_kernel.sa_ball_mlp_pool) on every input, across its
three runtime regimes:

  * sparse  — every row has cnt <= K: cheap sorted-order rank engages
  * dense   — some row has cnt > K: the in-kernel pl.when original-order
              re-rank engages (first-K-in-original-order subset)
  * overflow — a query tile's window exceeds W: lax.cond full fallback

Each fixture's regime is asserted with a host-side replica of the gate, so
a fixture drifting into the wrong regime fails loudly instead of silently
testing the fallback.  Reference semantics: tf_grouping_g.cu:3-36 +
pointnet_util.py:87-154 (via the full kernel, itself three-way
parity-tested in test_safused_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanobjectnn_tpu.ops.pallas.safused_kernel import sa_ball_mlp_pool
from scanobjectnn_tpu.ops.pallas.sabucket_kernel import (
    bucket_config,
    bucket_eligible,
)

B, N, M, K = 2, 1024, 256, 16
RADIUS = 0.2
FEATS = (16, 16, 32)
CFG = "640,32,128"  # W, T, G for the test shapes


def _gate(xyz, q, radius, wlen, qtile, gblk):
    """Host replica of the wrapper's gate: (overflow?, max neighbor cnt)."""
    xyz, q = np.asarray(xyz), np.asarray(q)
    b, n, _ = xyz.shape
    m = q.shape[1]
    ext = xyz.max(1) - xyz.min(1)
    ov, dmax = False, 0
    for i in range(b):
        ax = int(np.argmax(ext[i]))
        key = np.sort(xyz[i, :, ax])
        qk = np.sort(q[i, :, ax])
        pad = radius * (1 + 1e-5) + 1e-6
        for t in range(m // qtile):
            lo, hi = qk[t * qtile] - pad, qk[(t + 1) * qtile - 1] + pad
            s = np.searchsorted(key, lo, "left")
            e = np.searchsorted(key, hi, "right")
            c0 = min(s // gblk, n // gblk - wlen // gblk)
            ov = ov or (e - c0 * gblk > wlen)
        d2 = ((q[i][:, None, :] - xyz[i][None, :, :]) ** 2).sum(-1)
        dmax = max(dmax, int((d2 < radius * radius).sum(1).max()))
    return ov, dmax


@pytest.fixture(scope="module")
def weights_biases():
    rng = np.random.default_rng(7)
    ws = [jnp.asarray(rng.normal(size=(3, FEATS[0])).astype(np.float32) * 0.1)]
    bs = [jnp.asarray(rng.normal(size=(FEATS[0],)).astype(np.float32) * 0.1)]
    for a, c in zip(FEATS[:-1], FEATS[1:]):
        ws.append(jnp.asarray(rng.normal(size=(a, c)).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1))
    return ws, bs


def _cloud(regime):
    rng = np.random.default_rng(0)
    if regime == "sparse":
        pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    elif regime == "dense":
        centers = rng.normal(size=(B, 16, 3)) * np.array([4.0, 0.3, 0.3])
        assign = rng.integers(0, 16, size=(B, N))
        pts = (
            centers[np.arange(B)[:, None], assign]
            + rng.normal(size=(B, N, 3)) * 0.05
        ).astype(np.float32)
    elif regime == "overflow":
        pts = (rng.normal(size=(B, N, 3)) * 0.05).astype(np.float32)
    elif regime == "mixed_axes":
        # one sparse cloud widest in x, one dense cloud widest in y
        sparse = rng.normal(size=(N, 3)).astype(np.float32)
        centers = rng.normal(size=(16, 3)) * np.array([0.3, 4.0, 0.3])
        assign = rng.integers(0, 16, size=(N,))
        dense = (
            centers[assign] + rng.normal(size=(N, 3)) * 0.05
        ).astype(np.float32)
        pts = np.stack([sparse, dense], 0)
    return jnp.asarray(pts)


def _run(pts, ws, bs, monkeypatch, cfg, dtype):
    monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", cfg)
    return sa_ball_mlp_pool(
        RADIUS, K, pts, pts[:, :M, :], None, ws, bs, dtype=dtype,
        interpret=True, need_idx=False,
    )


@pytest.mark.parametrize("regime,want_ov,want_dense", [
    ("sparse", False, False),
    ("dense", False, True),
    ("overflow", True, None),  # fallback — in-window density irrelevant
    ("mixed_axes", False, True),
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bucketed_pooled_bit_parity(
    regime, want_ov, want_dense, dtype, weights_biases, monkeypatch
):
    ws, bs = weights_biases
    pts = _cloud(regime)
    wlen, qtile, gblk = (int(v) for v in CFG.split(","))
    ov, dmax = _gate(pts, pts[:, :M, :], RADIUS, wlen, qtile, gblk)
    assert ov == want_ov, f"fixture drifted: ov={ov} cnt_max={dmax}"
    if want_dense is not None:
        assert (dmax > K) == want_dense, f"fixture drifted: cnt_max={dmax}"

    ref, ref_idx = _run(pts, ws, bs, monkeypatch, "0", dtype)
    assert ref_idx is not None  # full kernel keeps its idx contract
    out, out_idx = _run(pts, ws, bs, monkeypatch, CFG, dtype)
    assert out_idx is None  # bucketed path emits no idx
    assert out.dtype == ref.dtype
    assert bool(jnp.all(out == ref)), (
        f"{regime}: max|diff|={float(jnp.max(jnp.abs(out - ref)))}"
    )


@pytest.mark.parametrize("regime", ["sparse", "dense"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bucketed_with_features_bit_parity(regime, dtype, monkeypatch):
    """The has_src (SA2) bucketed path: the sorted feature window rides in
    the extraction payload; pooled output must stay bit-exact vs the full
    kernel in both rank regimes, f32 (3-term packed features) and bf16."""
    rng = np.random.default_rng(5)
    n2, m2, k2, c2 = 512, 128, 16, 8
    feats2 = (16, 16, 32)
    # the clustered dense fixture needs a tighter query tile to fit W=384
    cfg = "384,32,128" if regime == "sparse" else "384,16,128"
    if regime == "sparse":
        pts = rng.normal(size=(B, n2, 3)).astype(np.float32)
    else:
        centers = rng.normal(size=(B, 8, 3)) * np.array([4.0, 0.3, 0.3])
        assign = rng.integers(0, 8, size=(B, n2))
        pts = (
            centers[np.arange(B)[:, None], assign]
            + rng.normal(size=(B, n2, 3)) * 0.05
        ).astype(np.float32)
    pts = jnp.asarray(pts)
    src = jnp.asarray(rng.normal(size=(B, n2, c2)).astype(np.float32))
    q = pts[:, :m2, :]
    wlen, qtile, gblk = (int(v) for v in cfg.split(","))
    ov, dmax = _gate(pts, q, RADIUS, wlen, qtile, gblk)
    assert not ov, "fixture drifted into overflow"
    assert (dmax > k2) == (regime == "dense"), f"cnt_max={dmax}"

    ws = [jnp.asarray(rng.normal(size=(3 + c2, feats2[0])) * 0.1, jnp.float32)]
    bs = [jnp.asarray(rng.normal(size=(feats2[0],)) * 0.1, jnp.float32)]
    for a, c in zip(feats2[:-1], feats2[1:]):
        ws.append(jnp.asarray(rng.normal(size=(a, c)) * 0.1, jnp.float32))
        bs.append(jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32))

    def run(cfg_str):
        monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", cfg_str)
        return sa_ball_mlp_pool(
            RADIUS, k2, pts, q, src, ws, bs, use_xyz=True, xyz_first=True,
            dtype=dtype, interpret=True, need_idx=False,
        )

    ref, ref_idx = run("0")
    assert ref_idx is not None
    out, out_idx = run(cfg)
    assert out_idx is None
    assert out.dtype == ref.dtype
    assert bool(jnp.all(out == ref)), (
        f"{regime} {dtype}: max|diff|="
        f"{float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))}"
    )


def test_bucketed_with_features_prelifted_parity(monkeypatch):
    """Prelifted has_src (C > feats[0], the MSG-scale shape): src arrives
    already multiplied by W0f; the bucketed kernel must skip the in-kernel
    W0f matmul and still match the full kernel bit-exactly."""
    rng = np.random.default_rng(9)
    n2, m2, k2, c2 = 512, 128, 16, 24  # c2 > feats2[0] => prelifted
    feats2 = (16, 32)
    pts = jnp.asarray(rng.normal(size=(B, n2, 3)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(B, n2, c2)).astype(np.float32))
    q = pts[:, :m2, :]
    ws = [jnp.asarray(rng.normal(size=(3 + c2, feats2[0])) * 0.1, jnp.float32)]
    bs = [jnp.asarray(rng.normal(size=(feats2[0],)) * 0.1, jnp.float32)]
    ws.append(jnp.asarray(rng.normal(size=feats2) * 0.1, jnp.float32))
    bs.append(jnp.asarray(rng.normal(size=(feats2[-1],)) * 0.1, jnp.float32))

    def run(cfg_str):
        monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", cfg_str)
        return sa_ball_mlp_pool(
            RADIUS, k2, pts, q, src, ws, bs, use_xyz=True, xyz_first=True,
            dtype=jnp.bfloat16, interpret=True, need_idx=False,
        )

    ref, _ = run("0")
    out, out_idx = run("384,32,128")
    assert out_idx is None
    assert bool(jnp.all(out == ref))


def test_boundary_points_stay_exact(weights_biases, monkeypatch):
    """Points at exactly key-distance r from a query (non-hits) and just
    inside (hits) must classify identically in both kernels — exercises
    the pad_r margin between the slab screen and the in-kernel d2."""
    ws, bs = weights_biases
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    # place a shell of points at exactly r and r*(1 - 1e-6) along x
    q0 = pts[:, :M, :].copy()
    pts[:, M : M + 64, :] = q0[:, :64, :] + np.array([RADIUS, 0.0, 0.0])
    pts[:, M + 64 : M + 128, :] = q0[:, 64:128, :] + np.array(
        [RADIUS * (1.0 - 1e-6), 0.0, 0.0]
    )
    pts = jnp.asarray(pts)
    ref, _ = _run(pts, ws, bs, monkeypatch, "0", jnp.float32)
    out, _ = _run(pts, ws, bs, monkeypatch, CFG, jnp.float32)
    assert bool(jnp.all(out == ref))


def test_eligibility_gates():
    cfg = (1152, 128, 128)
    ok = dict(n=2048, m=512, nsample=32, has_src=False, use_xyz=True,
              need_idx=False)
    assert bucket_eligible(cfg, **ok)
    assert not bucket_eligible(None, **ok)
    assert not bucket_eligible(cfg, **{**ok, "need_idx": True})
    # round 5: has_src shapes are eligible (the SA2 bucketed path)
    assert bucket_eligible(cfg, **{**ok, "has_src": True})
    assert not bucket_eligible(cfg, **{**ok, "use_xyz": False})
    assert not bucket_eligible(cfg, **{**ok, "n": 1024})  # no window win
    assert not bucket_eligible(cfg, **{**ok, "n": 2050})  # n % G
    assert not bucket_eligible(cfg, **{**ok, "m": 500})  # m % T
    assert not bucket_eligible(cfg, **{**ok, "nsample": 128})


def test_bucket_config_env(monkeypatch):
    from scanobjectnn_tpu.ops.pallas.sabucket_kernel import (
        resolve_bucket_config,
    )

    monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", "0")
    assert bucket_config() is None
    monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", "896,64,128")
    assert bucket_config() == (896, 64, 128)
    monkeypatch.delenv("SCANOBJECTNN_SA_BUCKET")
    # Round-5 default: "auto" — ON at the shapes where the on-chip A/B
    # measured the bucketed program faster (the rank-sort prep landed);
    # unknown shapes resolve to None (full kernel).
    assert bucket_config() == "auto"
    assert resolve_bucket_config("auto", 2048, 512) == (896, 64, 128)
    assert resolve_bucket_config("auto", 1024, 256) is None
    assert resolve_bucket_config((640, 32, 128), 2048, 512) == (640, 32, 128)
    assert resolve_bucket_config(None, 2048, 512) is None


def test_module_eval_dispatch(monkeypatch):
    """SAModule's eval fused path returns idx=None when the bucketed
    kernel engages, and a bit-identical pooled output either way."""
    from scanobjectnn_tpu.nn.pointnet_modules import SAModule

    monkeypatch.setenv("SCANOBJECTNN_FUSED_SA_EVAL", "interpret")
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(1, 1024, 3)).astype(np.float32))
    mod = SAModule(npoint=256, radius=0.2, nsample=16, mlp=(16, 32))
    variables = mod.init(jax.random.PRNGKey(0), pts, None, train=False)

    monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", "0")
    _, pooled_ref, idx_ref = mod.apply(variables, pts, None, train=False)
    assert idx_ref is not None
    monkeypatch.setenv("SCANOBJECTNN_SA_BUCKET", "640,32,128")
    _, pooled, idx = mod.apply(variables, pts, None, train=False)
    assert idx is None
    assert bool(jnp.all(pooled == pooled_ref))
