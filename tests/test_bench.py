"""bench.py's roofline accounting must be DERIVED from the live model
(round-3 VERDICT item 5): the analytic FLOPs come from model.SA_CONFIGS +
the actual Dense kernel shapes in the registered model's variables, so a
model-config drift cannot leave the benchmark measuring a different network
than it reports.  This test pins the derivation against the reference layer
dims (pointnet2/models/pointnet2_cls_ssg.py:20-34)."""

import importlib.util
import os

import jax
import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_analytic_flops_match_live_params():
    bench = _load_bench()
    from scanobjectnn_tpu import models as zoo

    model, _, _ = zoo.get_model("pointnet2_cls_ssg")
    key = jax.random.PRNGKey(0)
    # Param shapes are independent of N; init at the smallest N >= sa1.npoint.
    pts = jax.random.normal(key, (1, 512, 3))
    variables = model.init({"params": key, "dropout": key}, pts, train=False)

    batch, num_point = 128, 2048
    got = bench._analytic_model_flops(model, variables, batch, num_point)

    # Reference dims, written out independently (2 FLOPs/MAC).
    sa1 = 512 * 32 * (3 * 64 + 64 * 64 + 64 * 128)
    sa2 = 128 * 64 * (131 * 128 + 128 * 128 + 128 * 256)
    sa3 = 128 * (259 * 256 + 256 * 512 + 512 * 1024)  # group_all over 128 pts
    head = 1024 * 512 + 512 * 256 + 256 * 15
    expected = 2.0 * batch * (sa1 + sa2 + sa3 + head)
    assert got == pytest.approx(expected, rel=0, abs=0.5)


def test_sa_configs_drive_the_forward():
    """SA_CONFIGS is the single source of truth: the param tree must contain
    exactly one sa{i} module per config entry with the configured widths."""
    from scanobjectnn_tpu import models as zoo

    model, _, _ = zoo.get_model("pointnet2_cls_ssg")
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (1, 512, 3))
    variables = model.init({"params": key, "dropout": key}, pts, train=False)
    params = variables["params"]
    for i, (_np, _r, _ns, mlp, _ga) in enumerate(model.SA_CONFIGS):
        tree = params[f"sa{i + 1}"]["mlp"]
        for j, width in enumerate(mlp):
            assert tree[f"dense_{j}"]["kernel"].shape[1] == width
    assert f"sa{len(model.SA_CONFIGS) + 1}" not in params
