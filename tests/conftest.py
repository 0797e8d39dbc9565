"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The surrounding environment pins JAX_PLATFORMS=axon (one real remote TPU chip
with slow remote compiles); unit tests must run on local CPU with 8 virtual
devices for the multi-chip sharding tests (the reference has no distributed
surface; this is new TPU-first surface, see SURVEY.md §4). XLA_FLAGS must be
set before the first backend use; the platform override must go through
jax.config because the axon sitecustomize overrides the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the prover compiles one kernel per phase per
# shape; caching across test processes cuts suite time drastically.
import os as _os

_cache_dir = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:
    pass
