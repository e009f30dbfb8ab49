"""Test configuration: CPU backend with an 8-device virtual mesh.

Mirrors SURVEY.md section 4's implication: multi-chip tests must run without
TPU hardware.  Pallas kernels run in interpreter mode automatically on the
CPU backend (mc_tpu.ops._pallas.use_interpret); the counter-based RNG makes
kernel outputs bit-identical to the compiled TPU path.

XLA_FLAGS must be set before the CPU client is created; jax_platforms can be
forced via jax.config even though the container's sitecustomize registers
the TPU plugin at interpreter start.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
