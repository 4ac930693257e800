"""kexp22: int-domain gate bound — skip the f32 epilogue on gated-out
blocks (round 5).

Today every block pays the full epilogue (int32->f32 convert, *aux,
+mask — ~3 VPU ops/element over (B, BLK)) plus an f32 max pass just to
DECIDE the extraction gate, even though the gate is closed for the
overwhelming majority of blocks once the count floor seeds theta. For
int8 cosine/dot the epilogue is s = fl(g * aux) + mask with aux > 0
per-row and mask <= 0, so a per-query UPPER bound on the block's best
score is computable from the raw integer accumulator alone:

    gmax_q = max over rows of g (int32; < 2^24, exact in f32)
    ub_q   = gmax_q >= 0 ? fl(gmax_q * max(aux)) : fl(gmax_q * min(aux))

Soundness: for every element, g*aux <= gmax*amax (gmax>=0) or
g*aux <= gmax*amin (gmax<0) in the reals, and round-to-nearest is
monotone, so fl(g*aux) <= ub; mask only subtracts. A block with
ub <= theta therefore cannot contribute, and skipping its epilogue +
exact max is exact. Blocks whose ub clears theta compute the true
epilogue and re-gate on the true max (the shipped _extract_block_gated),
so a loose bound costs only occasional wasted epilogues, never wrongness.

Hypothesis: the serialized per-block VPU chain drops from
(convert+mul+add+max) to (int32 max) on gated-out blocks — ~1-1.5 us of
the measured ~4.7 us/block — worth ~0.5-0.8 ms at 1M rows.

A/B vs the shipped gated kernel, engine-matching count floor, int8,
k_scan in (24, 112), batch 256. Bit-exact asserted.

Usage: python experiments/kexp22.py [--interpret]
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrod_tpu.ops import distances as D
from vrod_tpu.ops import pallas_topk as P

RESULTS = Path(__file__).resolve().parent / "kexp_results.jsonl"


def _kernel_db_intgate(offset_ref, q_ref, t0_ref, *rest, metric, k,
                       block_rows, nblocks, precision):
    """P._kernel_db (manual double-buffered, gated) with the int-domain
    upper-bound gate wrapped around the epilogue itself."""
    (x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
     xbuf, abuf, mbuf, cv_ref, ci_ref, sems) = rest
    offset = offset_ref[0]
    kiota = lax.broadcasted_iota(jnp.int32, ov_ref.shape, 1)
    q = q_ref[:]
    theta0 = t0_ref[:]
    col_local = lax.broadcasted_iota(jnp.int32, (q.shape[0], block_rows), 1)

    def get_dma(slot, j):
        row0 = j * block_rows
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(row0, block_rows), :], xbuf.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(row0, block_rows)], abuf.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                mask_hbm.at[:, pl.ds(row0, block_rows)], mbuf.at[slot],
                sems.at[slot, 2]),
        )

    for d in get_dma(0, 0):
        d.start()

    cv_ref[:] = jnp.full(cv_ref.shape, P.NEG_INF, dtype=jnp.float32)
    ci_ref[:] = jnp.full(ci_ref.shape, -1, dtype=jnp.int32)

    def block_loop(j, _):
        cur = j % 2

        @pl.when(j + 1 < nblocks)
        def _():
            for d in get_dma((j + 1) % 2, j + 1):
                d.start()

        for d in get_dma(cur, j):
            d.wait()

        g = P._block_dot(q, xbuf[cur], precision)      # (B, BLK) int32
        aux_blk = abuf[cur][0, :]                      # (BLK,) f32, > 0
        amax = jnp.max(aux_blk)
        amin = jnp.min(aux_blk)
        gmax = jnp.max(g, axis=1, keepdims=True).astype(jnp.float32)
        ub = jnp.where(gmax >= 0.0, gmax * amax, gmax * amin)
        theta = jnp.maximum(cv_ref[:, k - 1:k], theta0)

        @pl.when(jnp.any(ub > theta))
        def _():
            s = P._epilogue(g, aux_blk, mbuf[cur][0, :], metric,
                            quantized=True)
            col = col_local + (j * block_rows + offset)
            P._extract_block_gated(s, col, cv_ref, ci_ref, k, kiota,
                                   theta0)

        return 0

    lax.fori_loop(0, nblocks, block_loop, 0)
    ov_ref[:] = cv_ref[:]
    oi_ref[:] = ci_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "b_tile",
                     "precision_name", "interpret"))
def fused_intgate(x, aux2d, mask2d, q, offset, theta0, *, k, metric,
                  block_rows, b_tile, precision_name, interpret):
    n, d = x.shape
    b = q.shape[0]
    nblocks = n // block_rows
    precision = P._PRECISIONS[precision_name]
    kernel = functools.partial(
        _kernel_db_intgate, metric=metric, k=k, block_rows=block_rows,
        nblocks=nblocks, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(b // b_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((b_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, d), x.dtype),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((b_tile, k), jnp.float32),
            pltpu.VMEM((b_tile, k), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offset, q, theta0, x, aux2d, mask2d)


def engine_floor_params(k_scan, rows, interpret=False):
    """int8 dim-768 cosine engine floor (see kexp21)."""
    if interpret:
        blk = 2048
        n_sample = (rows // 4 // blk) * blk
        assert (n_sample // blk) * 128 >= 2 * k_scan
        return n_sample, blk
    frac = 8 if k_scan >= 64 else 32
    blk = 16384
    n_sample = min(rows, max(128 * k_scan * 2, rows // frac))
    n_sample = (n_sample // blk) * blk
    assert (n_sample // blk) * 128 >= 2 * k_scan
    return n_sample, blk


@functools.lru_cache(maxsize=None)
def _leg(which, k_scan, n_sample, blk, interpret):
    @jax.jit
    def fn(x, aux, valid, q, aux2d, mask2d, offset, qs):
        sub = P.sampled_submax(
            x[:n_sample], aux[:n_sample], valid[:n_sample], q,
            metric="cosine", precision_name="fast", block_rows=blk,
            interpret=interpret)
        t0 = D.threshold_from_submax(sub, k_scan, method="count")
        if which == "stock":
            return P._fused_call_db(
                x, aux2d, mask2d, q, offset, t0, qs, k=k_scan,
                metric="cosine", block_rows=2048, b_tile=256,
                precision_name="fast", interpret=interpret, gated=True)
        return fused_intgate(
            x, aux2d, mask2d, q, offset, t0, k=k_scan, metric="cosine",
            block_rows=2048, b_tile=256, precision_name="fast",
            interpret=interpret)
    return fn


def timed(fn, args, iters):
    for _ in range(4):
        v, i = fn(*args)
    np.asarray(i[0, :1])
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    rows = args.rows if not args.interpret else 16384

    rng = np.random.default_rng(0)
    xf = rng.standard_normal((rows, args.dim)).astype(np.float32)
    x, aux = D.prepare_rows(jnp.asarray(xf), metric="cosine",
                            dtype=jnp.int8)
    valid = jnp.ones((rows,), bool)
    qf = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    q = D.prepare_queries(jnp.asarray(qf), metric="cosine", quantize=True)
    aux2d = aux.reshape(1, rows)
    mask2d = jnp.where(valid, 0.0, P.NEG_INF) \
        .astype(jnp.float32).reshape(1, rows)
    offset = jnp.zeros((1,), jnp.int32)
    qs = jnp.ones((args.batch, 1), jnp.float32)
    jax.block_until_ready((x, q))

    out = []
    for k_scan in (24, 112):
        n_sample, blk = engine_floor_params(k_scan, rows, args.interpret)
        inputs = (x, aux, valid, q, aux2d, mask2d, offset, qs)
        res = {}
        ref = None
        for which in ("stock", "intgate"):
            fn = _leg(which, k_scan, n_sample, blk, args.interpret)
            v, i = fn(*inputs)
            if ref is None:
                ref = (np.asarray(v), np.asarray(i))
            else:
                np.testing.assert_array_equal(np.asarray(v), ref[0])
                np.testing.assert_array_equal(np.asarray(i), ref[1])
            if args.interpret:
                continue
            ms = timed(fn, inputs, args.iters)
            res[which] = round(ms, 3)
            print(f"int8 k_scan={k_scan} {which}: {ms:.3f} ms", flush=True)
        if args.interpret:
            print(f"int8 k_scan={k_scan}: bit-exact OK (interpret)")
            continue
        delta = (res["stock"] / res["intgate"] - 1) * 100
        print(f"  -> intgate {delta:+.1f}% vs stock", flush=True)
        out.append({"exp": "kexp22-intgate", "dtype": "int8",
                    "k_scan": k_scan, "rows": rows, "dim": args.dim,
                    "batch": args.batch, **res})
    if out:
        with open(RESULTS, "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
