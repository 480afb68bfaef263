"""Test harness: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run against a
virtual 8-device CPU mesh (XLA host-platform device count), which exercises
the same partitioning/collective code paths XLA compiles for real ICI.

Note: this image's ``sitecustomize`` registers a remote-TPU PJRT plugin and
pins ``JAX_PLATFORMS=axon`` at interpreter boot, so the platform must be
overridden via ``jax.config`` (env vars are too late by conftest time).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeated test runs skip recompilation.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax
    pass
