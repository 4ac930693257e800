"""kexp17 (VERDICT r4 item 4a): fuse the sampled-floor pre-pass INTO the
main kernel — one stream, one launch, no separate approx_max_k op.

Stock top-100 path (performance.md decomposition, int8 batch 256):
submax pre-pass kernel ~0.3 ms + approx_max_k threshold ~0.85 ms + glue
~0.3 ms + main kernel ~6.5 ms. This experiment's kernel does all of it in
ONE pallas_call:

  Phase 1 (blocks 0..S-1, the sample): dot + epilogue + strided 128-group
     max into a VMEM submax scratch — no extraction, no while loop.
  Bisection: per-query binary search for the k-th largest submax via
     count reductions (`cnt = sum(sub > mid) >= k`), ~14 fori iterations
     over the (B, S*128) scratch. SOUND: the invariant count(> lo) >= k
     holds throughout, so lo < k-th largest submax <= true k-th best.
     TIGHTER than stock: approx_max_k (recall 0.95) can only loosen the
     floor, and nsub here is 8192 (block 2048) vs stock's 1024-2048.
  Phase 2 (blocks 0..nblocks-1): the stock zero-store extraction with
     theta0 = lo - margin. Because phase 1 and phase 2 score with the
     IDENTICAL in-kernel dot (same shapes, same lowering), submaxima are
     bit-exact elements of phase-2's score space — margin 0 is sound even
     for bf16 (stock needs 1e-3: its pre-pass uses different block shapes).

  Variant (--skip-sample-dots): phase 2 re-visits the sample blocks, but
  their per-query 128-lane submax row is still in VMEM — a block whose
  submax beats no query's theta is skipped WITHOUT the matmul (the DMA
  still streams to keep the pipeline shape; compute is the measured
  bottleneck at 512 GB/s, DMA-slot-invariant). Stock cannot do this: its
  pre-pass maxima never reach the main kernel.

Same-process kernel-level A/B vs stock (sampled_submax +
threshold_from_submax(approx) + fused_topk), identical final (vals, idx)
asserted, k_scan in (24, 112). Engine-level integration only happens if
this wins on hardware.

Usage: python experiments/kexp17.py [--rows 1048576] [--dim 768]
       python experiments/kexp17.py --interpret   # CPU correctness only
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


def _kernel_theta_fused(offset_ref, q_ref, margin_ref, *rest, metric, k,
                        block_rows, nblocks, s_blocks, bisect_iters,
                        precision, skip_sample_dots):
    (x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
     xbuf, abuf, mbuf, sub_ref, sems) = rest
    offset = offset_ref[0]
    b = q_ref.shape[0]
    kiota = lax.broadcasted_iota(jnp.int32, ov_ref.shape, 1)
    q = q_ref[:]
    col_local = lax.broadcasted_iota(jnp.int32, (b, block_rows), 1)

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

    def score_block(cur):
        g = P._block_dot(q, xbuf[cur], precision)
        return P._epilogue(g, abuf[cur][0, :], mbuf[cur][0, :], metric,
                           quantized=xbuf.dtype == jnp.int8)

    # ---- Phase 1: sample stream -> strided 128-group maxima -------------
    for d in get_dma(0, 0):
        d.start()

    def sample_loop(j, _):
        cur = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < s_blocks)
        def _():
            for d in get_dma(nxt, j + 1):
                d.start()

        for d in get_dma(cur, j):
            d.wait()
        s = score_block(cur)
        sub_ref[:, pl.ds(j * 128, 128)] = jnp.max(
            s.reshape(b, block_rows // 128, 128), axis=1)
        return 0

    lax.fori_loop(0, s_blocks, sample_loop, 0)

    # ---- Bisection: k-th largest submax via count reductions ------------
    sub = sub_ref[:]
    hi = jnp.max(sub, axis=1, keepdims=True)
    lo = jnp.min(sub, axis=1, keepdims=True) - 1.0  # count(> lo) = nsub >= k

    def bis(i, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((sub > mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, hi = lax.fori_loop(0, bisect_iters, bis, (lo, hi))
    theta0 = lo - margin_ref[:]

    # ---- Phase 2: full extraction stream ---------------------------------
    for d in get_dma(0, 0):
        d.start()

    def block_loop(j, carry):
        cv, ci = carry
        cur = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < nblocks)
        def _():
            for d in get_dma(nxt, j + 1):
                d.start()

        for d in get_dma(cur, j):
            d.wait()

        theta = jnp.maximum(cv[:, k - 1:k], theta0)
        if skip_sample_dots:
            # For sample blocks the per-query block max is already known
            # (it is the max of the block's 128 submax lanes): a block no
            # query can beat skips the matmul + extraction entirely.
            # Dynamic windows must be REF loads: lax.dynamic_slice on a
            # VALUE has no Mosaic lowering (hardware-only failure — the
            # interpret-mode leg passed with the value slice).
            blk = sub_ref[:, pl.ds(jnp.minimum(j, s_blocks - 1) * 128, 128)]
            blkmax = jnp.max(
                jnp.where(j < s_blocks, blk,
                          jnp.full((b, 128), jnp.inf, jnp.float32)),
                axis=1, keepdims=True)
            skip = jnp.logical_not(jnp.any(blkmax > theta))
            col = col_local + (j * block_rows + offset)

            def do(args):
                cv, ci = args
                s = score_block(cur)
                return P._extract_block(s, col, cv, ci, k, kiota, theta0)

            cv, ci = lax.cond(skip, lambda a: a, do, (cv, ci))
            return cv, ci
        s = score_block(cur)
        col = col_local + (j * block_rows + offset)
        return P._extract_block(s, col, cv, ci, k, kiota, theta0)

    init = (jnp.full(ov_ref.shape, P.NEG_INF, dtype=jnp.float32),
            jnp.full(oi_ref.shape, -1, dtype=jnp.int32))
    cv, ci = lax.fori_loop(0, nblocks, block_loop, init)
    ov_ref[:] = cv
    oi_ref[:] = ci


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "b_tile", "s_blocks",
                     "bisect_iters", "precision_name", "interpret",
                     "skip_sample_dots"))
def fused_theta(x, aux2d, mask2d, q, offset, margin, *, k, metric,
                block_rows, b_tile, s_blocks, bisect_iters, precision_name,
                interpret, skip_sample_dots):
    n, d = x.shape
    b = q.shape[0]
    nblocks = n // block_rows
    assert s_blocks * 128 >= 2 * k, "need >= 2k submaxima for a useful floor"
    precision = P._PRECISIONS[precision_name]
    kernel = functools.partial(
        _kernel_theta_fused, metric=metric, k=k, block_rows=block_rows,
        nblocks=nblocks, s_blocks=s_blocks, bisect_iters=bisect_iters,
        precision=precision, skip_sample_dots=skip_sample_dots)
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
            pltpu.VMEM((b_tile, s_blocks * 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offset, q, margin, x, aux2d, mask2d)


def stock_path(x, aux, valid, q, k_scan, metric, interpret):
    """The shipped composition: sampled pre-pass + approx threshold +
    fused kernel (mirrors engine._search_fn's floor wiring)."""
    sub = P.sampled_submax(x, aux, valid, q, metric=metric,
                           block_rows=8192, precision_name="fast",
                           interpret=interpret)
    t0 = D.threshold_from_submax(sub, k_scan, approx=not interpret,
                                 margin_abs=0.0 if x.dtype == jnp.int8
                                 else 1e-3)
    return P.fused_topk(x, aux, valid, q, k=k_scan, metric=metric,
                        precision_name="fast", interpret=interpret,
                        theta0=t0)


@functools.lru_cache(maxsize=None)
def _stock_jit(k_scan, metric, interpret):
    # Module-level jit cache (ADVICE r4): run_pair used to rebuild the
    # lambda per variant leg ('plain'/'skip'), recompiling the identical
    # stock program twice per (dtype, k_scan) pair.
    return jax.jit(lambda xx, aa, vv, qq: stock_path(
        xx, aa, vv, qq, k_scan, metric, interpret))


def run_pair(x, aux, valid, q, k_scan, *, metric, interpret, variant,
             iters=60):
    n, d = x.shape
    b = q.shape[0]
    block_rows = P.pick_block_rows(n, d, x.dtype.itemsize)
    # Sample = the same 1/8 fraction the engine's gate picks at 1M.
    s_blocks = max((n // 8) // block_rows, (2 * k_scan + 127) // 128)
    aux2d = aux.reshape(1, n)
    mask2d = jnp.where(valid, 0.0, P.NEG_INF).astype(jnp.float32) \
        .reshape(1, n)
    offset = jnp.zeros((1,), jnp.int32)
    margin = jnp.zeros((b, 1), jnp.float32)  # phases score bit-identically

    # The stock leg MUST be one jitted program like the fused leg (and
    # like the engine, which composes it inside a jitted shard_map):
    # called eagerly, each prep op (mask where/reshape, threshold glue)
    # dispatches separately over the tunnel and inflates the baseline ~2x
    # (the first hardware run measured "stock 16.78 ms" that way — vs the
    # engine's whole 4.6 ms batch including this kernel).
    stock_jit = _stock_jit(k_scan, metric, interpret)

    def stock():
        return stock_jit(x, aux, valid, q)

    def fused():
        return fused_theta(x, aux2d, mask2d, q, offset, margin, k=k_scan,
                           metric=metric, block_rows=block_rows,
                           b_tile=min(b, 256), s_blocks=s_blocks,
                           bisect_iters=14, precision_name="fast",
                           interpret=interpret,
                           skip_sample_dots=variant == "skip")

    # Correctness: identical top-k_scan (the floors differ slightly, but
    # both are sound, so the extracted top-k_scan sets must be identical).
    vs, is_ = stock()
    vf, if_ = fused()
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vf))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(if_))
    if interpret:
        return None, None

    def timed(fn):
        for _ in range(4):
            v, i = fn()
        np.asarray(i[0, :1])
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(iters):
                v, i = fn()
            np.asarray(i[0, :1])
            best = min(best, time.perf_counter() - t)
        return best / iters * 1e3

    return timed(stock), timed(fused)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rows = args.rows if not args.interpret else 16384
    out = []
    for dtype in ("int8", "bfloat16"):
        rng = np.random.default_rng(0)
        xf = rng.standard_normal((rows, args.dim)).astype(np.float32)
        x, aux = D.prepare_rows(jnp.asarray(xf), metric="cosine",
                                dtype=jnp.dtype(dtype))
        valid = jnp.ones((rows,), bool)
        qf = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
        q = D.prepare_queries(jnp.asarray(qf), metric="cosine",
                              quantize=jnp.dtype(dtype) == jnp.int8)
        jax.block_until_ready(x)
        for k_scan in (24, 112):
            for variant in ("plain", "skip"):
                ms_stock, ms_fused = run_pair(
                    x, aux, valid, q, k_scan, metric="cosine",
                    interpret=args.interpret, variant=variant)
                if args.interpret:
                    print(f"{dtype} k_scan={k_scan} {variant}: "
                          f"bit-exact OK (interpret)")
                    continue
                print(f"{dtype} k_scan={k_scan} {variant}: stock "
                      f"{ms_stock:.2f} ms, theta-fused {ms_fused:.2f} ms "
                      f"({(ms_stock / ms_fused - 1) * 100:+.1f}%)",
                      flush=True)
                out.append({"exp": "kexp17", "dtype": dtype,
                            "k_scan": k_scan, "variant": variant,
                            "ms_stock": round(ms_stock, 3),
                            "ms_fused": round(ms_fused, 3),
                            "rows": rows, "dim": args.dim,
                            "batch": args.batch})
    if out:
        with open(Path(__file__).parent / "kexp_results.jsonl", "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
