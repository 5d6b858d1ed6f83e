"""Test harness config: force CPU with 8 virtual devices BEFORE jax imports.

This is the simulated-mesh strategy from SURVEY.md §4: multi-chip sharding
logic (halo exchange, channel-parallel pipelines) is validated on a virtual
CPU mesh so no TPU pod is needed to keep tests green.
"""

import os

# CRN_TPU_TESTS=1 leaves the ambient backend (the tunneled TPU) in place
# for the on-hardware gates:  CRN_TPU_TESTS=1 pytest -m tpu
_tpu_run = os.environ.get("CRN_TPU_TESTS") == "1"

if not _tpu_run:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Hard override: the ambient environment may point JAX at a tunneled
    # TPU ("axon") via sitecustomize, which sets jax_platforms through
    # jax.config — env vars alone don't win. Unit tests always run on the
    # virtual CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _tpu_run:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
