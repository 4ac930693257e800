"""Runtime platform selection.

``VROD_PLATFORM`` (e.g. ``cpu``, ``tpu``) pins which JAX backend vrod-tpu
places collections on. The test suite sets ``VROD_PLATFORM=cpu`` together
with ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to run the real
multi-chip ``shard_map`` programs on a virtual 8-device CPU mesh (SURVEY.md
§7.4); production leaves it unset and uses the default backend (TPU).
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled programs across processes.

    The CLI is one-process-per-command; without this every invocation would
    recompile the search program (tens of seconds on TPU). Controlled by
    ``VROD_COMPILE_CACHE`` (set to ``0`` to disable)."""
    if os.environ.get("VROD_COMPILE_CACHE") == "0":
        return
    cache_dir = path or os.environ.get(
        "VROD_COMPILE_CACHE",
        os.path.expanduser("~/.cache/vrod-tpu/jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is best-effort


def default_devices():
    platform = os.environ.get("VROD_PLATFORM")
    if platform:
        return jax.devices(platform)
    return jax.devices()
