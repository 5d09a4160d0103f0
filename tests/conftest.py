"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

This is the "fake backend" the reference lacks (SURVEY.md §4): multi-chip
sharding logic is exercised single-process on virtual CPU devices; Pallas
kernels run in interpret mode.
"""

import os
import sys

# Force CPU: the ambient environment may export JAX_PLATFORMS=axon (the TPU
# tunnel), which is single-client and must stay free for bench runs.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: repeat test runs skip XLA recompiles.
import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS from the environment; force
# CPU + 8 virtual devices at the config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/dlm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
