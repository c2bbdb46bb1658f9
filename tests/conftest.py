"""Test harness config: force an 8-device virtual CPU mesh.

All tests run on CPU (deterministic, no TPU needed) with 8 virtual
devices so sharding/pjit paths are exercised the way the driver's
`dryrun_multichip` does.

NOTE: environments that pre-register a TPU plugin via sitecustomize may
set `jax.config.jax_platforms` programmatically, which overrides the
JAX_PLATFORMS env var — so we override the *config* after import, before
any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses / plain environments
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
