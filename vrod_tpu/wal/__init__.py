from .wal import Wal
from . import ops

__all__ = ["Wal", "ops"]
