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


def default_devices():
    platform = os.environ.get("VROD_PLATFORM")
    if platform:
        return jax.devices(platform)
    return jax.devices()
