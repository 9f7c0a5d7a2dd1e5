"""Test configuration: force an 8-device virtual CPU platform BEFORE jax import.

This is how JAX code tests multi-chip sharding without real hardware
(SURVEY.md §4): Mesh/pjit programs compile and execute against 8 host devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU-tunnel plugin (when present) force-registers itself via
# sitecustomize and overrides JAX_PLATFORMS; pin CPU at the config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the fast tier is dominated by XLA:CPU compiles of
# the full models (e.g. the stereodpnet init fixture); warm reruns skip them.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
