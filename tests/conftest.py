"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 implication (d)).
Pallas kernels run in interpreter mode on CPU (exercised explicitly in the
kernel tests via ``interpret=True``).

Note: the session environment pins JAX at the tunneled TPU ('axon' plugin)
and ignores the JAX_PLATFORMS env var, so we must force the CPU backend via
jax.config before any backend is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2021)
