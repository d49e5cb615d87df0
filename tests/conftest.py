"""Test config: run on CPU with 8 virtual devices so kernel (interpret
mode) and multi-device sharding tests work without TPU hardware.

Set SPMV_TPU_TEST_BACKEND=tpu to run the kernel tests compiled on a real
chip instead.
"""

import os

backend = os.environ.get("SPMV_TPU_TEST_BACKEND", "cpu")
if backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon sitecustomize force-registers the TPU backend and resets
    # jax_platforms; override it back after import.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
