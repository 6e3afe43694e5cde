"""Test configuration: run on a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding correctness
(decomposition invariance — the analog of the reference's bfbflag oracle,
SURVEY.md section 4.2) is validated on a virtual CPU mesh. Must set XLA flags
before jax initializes.
"""
import os
import sys

# The container's sitecustomize registers a TPU PJRT plugin in every python
# process at interpreter startup, which freezes the jax backend before this
# conftest can request 8 virtual CPU devices. Re-exec pytest once in a clean
# environment (CPU-only, axon registration disabled).
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    import subprocess
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # drop the sitecustomize dir that eagerly registers the TPU plugin
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-m", "pytest"] + sys.argv[1:],
                       env=env)
    os._exit(r.returncode)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)  # f64 available for oracle tests

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long integration runs (deselect: -m 'not slow')")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
