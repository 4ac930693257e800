"""kexp23: int4 packed tier vs int8 — fused-kernel hardware A/B (round 5).

The int4 tier halves the row stream (two dims per byte) at the cost of an
in-VMEM nibble unpack (two int32 shift passes + two int8 casts per block)
and TWO half-dim MXU dots instead of one full-dim dot (same MAC count).
Prior rounds established the 1M-point kernel is MXU+VPU-serialization
bound, NOT DMA bound (kexp6: flat 512 GB/s across DMA slot counts), so the
expected outcome at 1M is "unpack overhead vs halved DMA ~ a wash or a
small loss" — the tier's value is CAPACITY (2x rows/chip; the 10M+ point
is where the halved stream can also pay). This experiment measures, does
not assume.

A/B at 1M x 768 cosine batch 256, engine-matching count floor, k_scan in
(24, 112), int8 stock leg vs int4 packed leg over the SAME f32 source
rows. Legs are different stored representations, so no cross-leg
bit-exactness exists; each leg self-checks against its own exact scan
path at small rows in --interpret mode instead.

Usage: python experiments/kexp23.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vrod_tpu.ops import distances as D
from vrod_tpu.ops import pallas_topk as P

RESULTS = Path(__file__).resolve().parent / "kexp_results.jsonl"

from kexp21 import engine_floor_params, timed  # one copy of methodology


@functools.lru_cache(maxsize=None)
def _leg(k_scan, n_sample, blk, packed, interpret):
    @jax.jit
    def fn(x, aux, valid, q, aux2d, mask2d, offset, qs):
        sub = P.sampled_submax(
            x[:n_sample], aux[:n_sample], valid[:n_sample], q,
            metric="cosine", precision_name="fast", block_rows=blk,
            interpret=interpret, packed=packed)
        t0 = D.threshold_from_submax(sub, k_scan, method="count")
        return P._fused_call_db(
            x, aux2d, mask2d, q, offset, t0, qs, k=k_scan,
            metric="cosine", block_rows=2048, b_tile=256,
            precision_name="fast", interpret=interpret, gated=True,
            packed=packed)
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    rows = args.rows if not args.interpret else 16384

    rng = np.random.default_rng(0)
    xf = rng.standard_normal((rows, args.dim)).astype(np.float32)
    qf = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    q = D.prepare_queries(jnp.asarray(qf), metric="cosine", quantize=True)
    qs = jnp.ones((args.batch, 1), jnp.float32)
    offset = jnp.zeros((1,), jnp.int32)
    valid = jnp.ones((rows,), bool)
    mask2d = jnp.where(valid, 0.0, P.NEG_INF) \
        .astype(jnp.float32).reshape(1, rows)

    out = []
    for dtype, packed in (("int8", False), ("int4", True)):
        x, aux = D.prepare_rows(jnp.asarray(xf), metric="cosine",
                                dtype="int4" if packed else jnp.int8)
        aux2d = aux.reshape(1, rows)
        jax.block_until_ready((x, q))
        for k_scan in (24, 112):
            n_sample, blk = engine_floor_params(
                k_scan, rows, x.shape[1], x.dtype.itemsize, args.interpret)
            fn = _leg(k_scan, n_sample, blk, packed, args.interpret)
            inputs = (x, aux, valid, q, aux2d, mask2d, offset, qs)
            v, i = fn(*inputs)
            if args.interpret:
                # Self-check vs the scan path on this leg's stored rep and
                # the SAME quantized query (integer dots are exact in f32,
                # so kernel and scan scores are bit-identical).
                vs, is_ = D.blockwise_topk(
                    x, aux, valid, q.astype(jnp.float32),
                    k=k_scan, metric="cosine",
                    precision=jax.lax.Precision.HIGHEST,
                    block_rows=2048, nblocks=rows // 2048, packed=packed)
                np.testing.assert_array_equal(np.asarray(i), np.asarray(is_))
                print(f"{dtype} k_scan={k_scan}: kernel == exact scan "
                      f"(interpret)")
                continue
            ms = timed(fn, inputs, args.iters)
            print(f"{dtype} k_scan={k_scan}: {ms:.3f} ms "
                  f"({args.batch / ms * 1e3:,.0f} q/s)", flush=True)
            out.append({"exp": "kexp23-int4-tier", "dtype": dtype,
                        "k_scan": k_scan, "rows": rows, "dim": args.dim,
                        "batch": args.batch, "ms": round(ms, 3)})
    if out:
        with open(RESULTS, "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
