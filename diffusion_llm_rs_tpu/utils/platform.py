"""Platform pinning helper.

The axon TPU PJRT plugin can override `JAX_PLATFORMS` from the environment at
import time. Call `honor_platform_env()` BEFORE any jax computation to re-apply
the user's env choice at the config level (no-op when the env var is unset or
jax is already initialized on the right backend).
"""

from __future__ import annotations

import os

import jax


def honor_platform_env(default_cpu_devices: int = 8) -> None:
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    try:
        jax.config.update("jax_platforms", want)
        if want == "cpu":
            flags = os.environ.get("XLA_FLAGS", "")
            n = default_cpu_devices
            if "device_count=" in flags:
                n = int(flags.rsplit("device_count=", 1)[1].split()[0])
            jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass  # backend already initialized; leave as-is
