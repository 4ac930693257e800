"""Fused Pallas TPU kernel: blocked distance matmul + on-chip top-k.

Placeholder wiring for the engine's ``impl="pallas"`` path; the fused kernel
lands in a subsequent milestone. Falls back to the scan implementation so the
call surface is stable.
"""

from __future__ import annotations

from . import distances as D


def fused_topk(x, aux, valid, q, *, k, metric, block_rows, index_offset=0):
    nblocks = x.shape[0] // block_rows
    return D.blockwise_topk(
        x, aux, valid, q, k=k, metric=metric,
        precision=D.PRECISIONS["high"], block_rows=block_rows,
        nblocks=nblocks, index_offset=index_offset)
