"""vrod-tpu: a TPU-native exact-kNN vector store.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
sekulas/vRod (see SURVEY.md): collections as row-sharded HBM-resident
embedding tensors, exact similarity search as a blocked distance matmul fused
with on-chip top-k, mutations through a host-side C++ WAL + slot allocator,
and multi-chip scaling via ``jax.shard_map`` over an ICI mesh with all-gather
top-k merge.

Exports resolve lazily (PEP 562): ``from vrod_tpu.client import VrodClient``
in a client-only process stays a sockets+json import — it must not pay for
(or accidentally initialize) the jax/engine stack behind ``Database``.
"""

import importlib

from .config import VROD_VERSION  # dependency-light (json/pathlib only)

__version__ = VROD_VERSION

# attribute -> submodule that defines it ("" = the submodule itself).
_EXPORTS = {
    "Collection": ".collection",
    "SearchHit": ".collection",
    "CollectionConfig": ".config",
    "DatabaseConfig": ".config",
    "Database": ".database",
    "QueryBatcher": ".frontend",
    "Record": ".records",
    "format_record": ".records",
    "parse_record": ".records",
    "VrodServer": ".server",
    "Replicator": ".replication",
    "ReplicationError": ".replication",
    "VrodClient": ".client",
    "VrodPool": ".pool",
    "VrodServerError": ".client",
    "VrodConnectionError": ".client",
    "verify_recall": ".utils.verify",
    "metrics": "",
    "errors": "",
}

__all__ = sorted(_EXPORTS) + ["VROD_VERSION", "__version__"]


def __getattr__(name):
    target = _EXPORTS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    if target == "":
        val = importlib.import_module(f".{name}", __name__)
    else:
        val = getattr(importlib.import_module(target, __name__), name)
    globals()[name] = val  # cache: subsequent access skips __getattr__
    return val


def __dir__():
    return sorted(set(list(globals()) + __all__))
