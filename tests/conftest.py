"""Test config: run everything on an 8-virtual-device CPU mesh.

Multi-chip behavior is tested without a pod by forcing the host platform to
expose 8 devices (the reference only ever tested multi-tile behavior on real
hardware, SURVEY.md §4 — we do better). Must run before jax is imported.
"""

import os

# Force, don't setdefault: the axon environment pre-sets JAX_PLATFORMS=axon
# (the tunneled TPU) via a sitecustomize that overrides the env var, so the
# config must be re-forced *after* importing jax. Tests run on the virtual
# 8-device CPU mesh regardless of the attached hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
