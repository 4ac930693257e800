"""vrod-tpu: a TPU-native exact-kNN vector store.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
sekulas/vRod (see SURVEY.md): collections as row-sharded HBM-resident
embedding tensors, exact similarity search as a blocked distance matmul fused
with on-chip top-k, mutations through a host-side C++ WAL + slot allocator,
and multi-chip scaling via ``jax.shard_map`` over an ICI mesh with all-gather
top-k merge.
"""

from . import metrics
from .client import VrodClient, VrodServerError
from .collection import Collection, SearchHit
from .config import CollectionConfig, DatabaseConfig, VROD_VERSION
from .database import Database
from .frontend import QueryBatcher
from .records import Record, format_record, parse_record
from .server import VrodServer
from .utils.verify import verify_recall

__version__ = VROD_VERSION

__all__ = [
    "Collection", "SearchHit", "CollectionConfig", "DatabaseConfig",
    "Database", "QueryBatcher", "Record", "format_record", "parse_record",
    "VrodServer", "VrodClient", "VrodServerError",
    "metrics", "verify_recall", "VROD_VERSION", "__version__",
]
