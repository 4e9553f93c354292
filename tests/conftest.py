"""Test config: run everything on an 8-virtual-device CPU mesh.

Multi-chip behavior is tested without a pod by forcing the host platform to
expose 8 devices (the reference only ever tested multi-tile behavior on real
hardware, SURVEY.md §4 — we do better). Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
