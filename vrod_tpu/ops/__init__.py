from . import distances, pallas_topk

__all__ = ["distances", "pallas_topk"]
