"""Test configuration: run everything on a simulated 8-device CPU mesh.

The reference has no automated test suite (SURVEY.md §4); this suite is
net-new.  Multi-chip sharding is validated on virtual CPU devices — the same
path the driver's ``dryrun_multichip`` uses.

NOTE: the environment's sitecustomize imports jax at interpreter startup, so
``JAX_PLATFORMS``/``XLA_FLAGS`` set here would be too late.  We instead use
``jax.config.update`` before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt-and-braces for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
