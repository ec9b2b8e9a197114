"""Test configuration: CPU backend with a virtual 8-device mesh and f64.

Mirrors the reference's f64 serial execution for parity tests; the virtual
device mesh exercises the sharded paths without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the tunneled TPU), so the platform must be overridden via
jax.config *after* import — env vars are already baked.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the big jitted solve programs (outer FGMRES +
# inner CG + GMG in one computation) take O(10s) to compile on this host;
# caching makes repeated test runs cheap.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
