"""Backend-selection helper for scripts and examples.

On this machine a sitecustomize pins jax_platforms to the tunneled TPU
backend in-config, which SILENTLY overrides the JAX_PLATFORMS env var —
and when the tunnel is down, the first jax.devices() call hangs instead
of erroring. Every entry point that a user might run with
JAX_PLATFORMS=cpu (examples, bench scripts) calls this before touching
devices; same logic as cli._honor_platform_env and
__graft_entry__._force_cpu_if_needed.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Make an explicit JAX_PLATFORMS env setting effective even where a
    sitecustomize has pinned a different backend in-config. Must run
    before the first jax.devices() / backend initialization."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
