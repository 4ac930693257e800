"""kexp21: b_tile 512 re-check POST-gating (round 5).

The kexp12 dead end ("b_tile 512 at batch 512: one collection stream
instead of two, but the shared extraction loop pays max-over-512 queries
-- net loss") was measured in round 3 on the PRE-gating kernel with the
approx floor. The round-5 gated extraction changed exactly the tradeoff
it lost on: blocks that cannot contribute now skip the while ENTRY, so
the wider tile's extra extraction exposure is paid only on contributing
blocks, while the halved HBM stream + halved per-block fixed cost are
paid everywhere. Same reason kexp20-blk re-checked block_rows 4096.

A/B at 1M x 768 cosine, batch 512, engine-matching floor (count method,
engine frac/blk selection), k_scan in (24, 112), int8 first (the
BASELINE default). Results asserted bit-identical across b_tile (tile
grouping affects the shared loop, never per-query outputs).

Usage: python experiments/kexp21.py [--interpret]
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


def engine_floor_params(k_scan, rows, dim, itemsize, interpret=False):
    """Replicate engine._search_fn's floor_gate/_gate_for for int8/bf16
    cosine so the experiment's floor is the ENGINE's floor."""
    if interpret:
        # Tiny-rows correctness leg: any open-gate floor works — the
        # interpret run only asserts bt256 == bt512 bit-exact.
        blk = 2048
        n_sample = (rows // 4 // blk) * blk
        assert (n_sample // blk) * 128 >= 2 * k_scan
        return n_sample, blk
    frac = 8 if k_scan >= 64 else 32
    for blk in (16384, 8192):
        while blk * dim * itemsize > P.SUBMAX_VMEM_BYTES and blk > 128:
            blk //= 2
        n_sample = min(rows, max(128 * k_scan * 2, rows // frac))
        n_sample = (n_sample // blk) * blk
        nsub = (n_sample // blk) * 128
        if nsub >= 2 * k_scan and rows >= min(frac, 4) * n_sample:
            return n_sample, blk
    raise AssertionError("floor gate closed at this config")


@functools.lru_cache(maxsize=None)
def _leg(k_scan, b_tile, n_sample, blk, interpret):
    @jax.jit
    def fn(x, aux, valid, q, aux2d, mask2d, offset, qs):
        sub = P.sampled_submax(
            x[:n_sample], aux[:n_sample], valid[:n_sample], q,
            metric="cosine", precision_name="fast", block_rows=blk,
            interpret=interpret)
        t0 = D.threshold_from_submax(sub, k_scan, method="count")
        return P._fused_call_db(
            x, aux2d, mask2d, q, offset, t0, qs, k=k_scan,
            metric="cosine", block_rows=2048, b_tile=b_tile,
            precision_name="fast", interpret=interpret, gated=True)
    return fn


def timed(fn, args, iters):
    for _ in range(4):
        v, i = fn(*args)
    np.asarray(i[0, :1])  # sync (block_until_ready is a no-op on tunnel)
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(iters):
            v, i = fn(*args)
        np.asarray(i[0, :1])
        best = min(best, time.perf_counter() - t)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--dtypes", default="int8")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    rows = args.rows if not args.interpret else 16384

    out = []
    for dtype in args.dtypes.split(","):
        rng = np.random.default_rng(0)
        xf = rng.standard_normal((rows, args.dim)).astype(np.float32)
        x, aux = D.prepare_rows(jnp.asarray(xf), metric="cosine",
                                dtype=jnp.dtype(dtype))
        valid = jnp.ones((rows,), bool)
        qf = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
        q = D.prepare_queries(jnp.asarray(qf), metric="cosine",
                              quantize=jnp.dtype(dtype) == jnp.int8)
        aux2d = aux.reshape(1, rows)
        mask2d = jnp.where(valid, 0.0, P.NEG_INF) \
            .astype(jnp.float32).reshape(1, rows)
        offset = jnp.zeros((1,), jnp.int32)
        qs = jnp.ones((args.batch, 1), jnp.float32)
        jax.block_until_ready((x, q))

        for k_scan in (24, 112):
            n_sample, blk = engine_floor_params(
                k_scan, rows, args.dim, x.dtype.itemsize, args.interpret)
            res, ref_i = {}, None
            for bt in (256, 512):
                fn = _leg(k_scan, bt, n_sample, blk, args.interpret)
                inputs = (x, aux, valid, q, aux2d, mask2d, offset, qs)
                v, i = fn(*inputs)
                if ref_i is None:
                    ref_i = np.asarray(i)
                else:
                    np.testing.assert_array_equal(np.asarray(i), ref_i)
                if args.interpret:
                    continue
                ms = timed(fn, inputs, args.iters)
                res[f"bt{bt}"] = round(ms, 3)
                print(f"{dtype} k_scan={k_scan} bt{bt}: {ms:.3f} ms "
                      f"({args.batch / ms * 1e3:,.0f} q/s)", flush=True)
            if args.interpret:
                print(f"{dtype} k_scan={k_scan}: bit-exact OK (interpret)")
                continue
            out.append({"exp": "kexp21-btile512-gated", "dtype": dtype,
                        "k_scan": k_scan, "rows": rows, "dim": args.dim,
                        "batch": args.batch, **res})
    if out:
        with open(RESULTS, "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
