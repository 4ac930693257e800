"""Device mesh construction for row-sharded collections.

The reference is single-threaded/single-process (non-Send
``Rc<RefCell<Database>>``, ``src/command/types.rs:10``); distribution enters
this framework TPU-natively: collections row-shard over a 1-D ``jax.sharding``
mesh axis ``"rows"`` and per-shard top-k results merge with an XLA all-gather
over ICI (see ``vrod_tpu/engine.py``). A single chip is simply a 1-device
mesh, so every code path is the distributed one.
"""

from __future__ import annotations

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime import default_devices

ROWS_AXIS = "rows"


def make_mesh(shards: int, devices=None) -> Mesh:
    if devices is None:
        devices = default_devices()
    if shards > len(devices):
        raise ValueError(
            f"Requested {shards} shards but only {len(devices)} devices are "
            f"available"
        )
    return Mesh(np.array(devices[:shards]), (ROWS_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows split across the mesh; feature dim replicated."""
    return NamedSharding(mesh, P(ROWS_AXIS, None))


def vec_sharding(mesh: Mesh) -> NamedSharding:
    """1-D per-row metadata (aux, valid) split the same way as rows."""
    return NamedSharding(mesh, P(ROWS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
