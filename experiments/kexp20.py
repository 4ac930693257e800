"""kexp20 (round 5): fused-theta0 + sample-skip ON TOP of the shipped
gated extraction — does one-launch floor computation still pay once the
extraction loop is pl.when-gated?

Context: kexp17 measured the fused-theta0 'skip' variant at -6% vs the
then-stock composition at k_scan 112 — but both legs predated gating.
Round 5 shipped gating (fused_topk) and the count floor; the engine's
top-100 path is now: submax pre-pass kernel + count threshold + glue +
GATED main kernel. This experiment fuses all of it into ONE pallas_call:

  Phase 1 (sample blocks): dot + epilogue + strided 128-group max into a
    VMEM scratch (no extraction).
  Bisection: k-th largest submax via count reductions (14 iters) — a
    SOUND floor (lo < kth submax <= true kth best); phases score with
    the IDENTICAL in-kernel dot, so margin 0 is sound for every dtype.
  Phase 2 (all blocks): the SHIPPED gated extraction (ref carry +
    pl.when), with the sample blocks' stored submaxima letting a
    non-contributing sample block skip its matmul entirely (the DMA
    still streams to preserve pipeline shape).

A/B legs (same process, identical results asserted bit-exact):
  stock = one jitted program of the shipped engine composition
          (sampled_submax + threshold_from_submax(count) + fused_topk,
          gated default) — mirrors engine._search_fn's floor wiring.
  fused = the one-launch kernel above.

Also: --sweep-block re-measures block_rows in (1024, 2048, 4096) for the
shipped gated kernel. The 2048 sweet spot was tuned when every block
paid a while-loop ENTRY; gating changed that tradeoff, so the old
"block-4096 wash" dead-end entry (pre-gating) needs a post-gating check.

Usage: python experiments/kexp20.py [--rows 1048576] [--dim 768]
       python experiments/kexp20.py --interpret    # CPU correctness only
       python experiments/kexp20.py --sweep-block  # block size re-sweep
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


def _kernel_theta_gated(offset_ref, q_ref, *rest, metric, k, block_rows,
                        nblocks, s_blocks, bisect_iters, precision,
                        skip_sample_dots):
    (x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
     xbuf, abuf, mbuf, sub_ref, cv_ref, ci_ref, sems) = rest
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

        @pl.when(j + 1 < s_blocks)
        def _():
            for d in get_dma((j + 1) % 2, j + 1):
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
    lo = jnp.min(sub, axis=1, keepdims=True) - 1.0  # count(> lo) >= k

    def bis(i, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((sub > mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, hi = lax.fori_loop(0, bisect_iters, bis, (lo, hi))
    theta0 = lo  # phases score bit-identically: margin 0 is sound

    # ---- Phase 2: gated extraction stream --------------------------------
    cv_ref[:] = jnp.full(cv_ref.shape, P.NEG_INF, dtype=jnp.float32)
    ci_ref[:] = jnp.full(ci_ref.shape, -1, dtype=jnp.int32)

    for d in get_dma(0, 0):
        d.start()

    def block_loop(j, _):
        cur = j % 2

        @pl.when(j + 1 < nblocks)
        def _():
            for d in get_dma((j + 1) % 2, j + 1):
                d.start()

        for d in get_dma(cur, j):
            d.wait()

        col = col_local + (j * block_rows + offset)
        if skip_sample_dots:
            # A sample block's per-query max is already in VMEM (max of
            # its 128 submax lanes): if no query can beat theta, skip the
            # MATMUL too, not just the extraction. Dynamic windows must
            # be REF loads (lax.dynamic_slice on a value has no Mosaic
            # lowering — kexp17's hardware-only failure).
            theta = jnp.maximum(cv_ref[:, k - 1:k], theta0)
            blk = sub_ref[:, pl.ds(jnp.minimum(j, s_blocks - 1) * 128, 128)]
            blkmax = jnp.max(
                jnp.where(j < s_blocks, blk,
                          jnp.full((b, 128), jnp.inf, jnp.float32)),
                axis=1, keepdims=True)
            can = jnp.any(blkmax > theta)

            @pl.when(can)
            def _():
                s = score_block(cur)
                P._extract_block_gated(s, col, cv_ref, ci_ref, k, kiota,
                                       theta0)
        else:
            s = score_block(cur)
            P._extract_block_gated(s, col, cv_ref, ci_ref, k, kiota, theta0)
        return 0

    lax.fori_loop(0, nblocks, block_loop, 0)
    ov_ref[:] = cv_ref[:]
    oi_ref[:] = ci_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "b_tile", "s_blocks",
                     "bisect_iters", "precision_name", "interpret",
                     "skip_sample_dots"))
def fused_theta_gated(x, aux2d, mask2d, q, offset, *, k, metric, block_rows,
                      b_tile, s_blocks, bisect_iters, precision_name,
                      interpret, skip_sample_dots):
    n, d = x.shape
    b = q.shape[0]
    nblocks = n // block_rows
    assert s_blocks * 128 >= 2 * k, "need >= 2k submaxima for a useful floor"
    precision = P._PRECISIONS[precision_name]
    kernel = functools.partial(
        _kernel_theta_gated, metric=metric, k=k, block_rows=block_rows,
        nblocks=nblocks, s_blocks=s_blocks, bisect_iters=bisect_iters,
        precision=precision, skip_sample_dots=skip_sample_dots)
    return pl.pallas_call(
        kernel,
        grid=(b // b_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_tile, d), lambda i: (i, 0),
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
            pltpu.VMEM((b_tile, k), jnp.float32),
            pltpu.VMEM((b_tile, k), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offset, q, x, aux2d, mask2d)


def stock_path(x, aux, valid, q, k_scan, metric, interpret, frac,
               pre_blk):
    """The shipped r5 composition: sampled pre-pass + COUNT threshold +
    gated fused kernel (mirrors engine._search_fn's floor wiring).
    ``frac``/``pre_blk`` mirror the engine's gate: rows/8 at blk 8192 is
    the large-k config; the engine's SMALL-k config is rows/32 at the
    auto blk (16384 at 1M int8)."""
    n = x.shape[0]
    n_sample = min(n, max(128 * k_scan * 2, n // frac))
    n_sample = (n_sample // pre_blk) * pre_blk
    sub = P.sampled_submax(x[:n_sample], aux[:n_sample], valid[:n_sample],
                           q, metric=metric, block_rows=pre_blk,
                           precision_name="fast", interpret=interpret)
    t0 = D.threshold_from_submax(sub, k_scan, method="count",
                                 margin_abs=0.0 if x.dtype == jnp.int8
                                 else 1e-3)
    return P.fused_topk(x, aux, valid, q, k=k_scan, metric=metric,
                        precision_name="fast", interpret=interpret,
                        theta0=t0)


@functools.lru_cache(maxsize=None)
def _stock_jit(k_scan, metric, interpret, frac, pre_blk):
    return jax.jit(lambda xx, aa, vv, qq: stock_path(
        xx, aa, vv, qq, k_scan, metric, interpret, frac, pre_blk))


def timed(fn, iters=60):
    for _ in range(4):
        v, i = fn()
    np.asarray(i[0, :1])  # sync (block_until_ready is a no-op on tunnel)
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(iters):
            v, i = fn()
        np.asarray(i[0, :1])
        best = min(best, time.perf_counter() - t)
    return best / iters * 1e3


def run_pair(x, aux, valid, q, k_scan, *, metric, interpret, variant,
             frac=8, pre_blk=8192):
    n, d = x.shape
    b = q.shape[0]
    block_rows = P.pick_block_rows(n, d, x.dtype.itemsize)
    s_blocks = max((n // frac) // block_rows, (2 * k_scan + 127) // 128)
    aux2d = aux.reshape(1, n)
    mask2d = jnp.where(valid, 0.0, P.NEG_INF).astype(jnp.float32) \
        .reshape(1, n)
    offset = jnp.zeros((1,), jnp.int32)
    stock_jit = _stock_jit(k_scan, metric, interpret, frac, pre_blk)

    def stock():
        return stock_jit(x, aux, valid, q)

    def fused():
        return fused_theta_gated(
            x, aux2d, mask2d, q, offset, k=k_scan, metric=metric,
            block_rows=block_rows, b_tile=min(b, 256), s_blocks=s_blocks,
            bisect_iters=14, precision_name="fast", interpret=interpret,
            skip_sample_dots=variant == "skip")

    vs, is_ = stock()
    vf, if_ = fused()
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vf))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(if_))
    if interpret:
        return None, None
    return timed(stock), timed(fused)


def sweep_block(x, aux, valid, q, k_scan, *, interpret):
    """Gated-kernel block_rows re-sweep (floor disabled to isolate the
    stream/extraction tradeoff, like the original 2048 tuning)."""
    out = []
    for blk in (1024, 2048, 4096):
        fn = jax.jit(functools.partial(
            P.fused_topk, k=k_scan, metric="cosine", block_rows=blk,
            precision_name="fast", interpret=interpret))

        def call():
            return fn(x, aux, valid, q)

        v, i = call()
        if interpret:
            continue
        ms = timed(call)
        print(f"  blk {blk}: {ms:.3f} ms", flush=True)
        out.append({"exp": "kexp20-blk", "dtype": str(x.dtype),
                    "k_scan": k_scan, "block_rows": blk,
                    "ms": round(ms, 3), "rows": x.shape[0],
                    "dim": x.shape[1], "batch": q.shape[0]})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--sweep-block", action="store_true")
    ap.add_argument("--frac", type=int, default=8,
                    help="sample fraction denominator for BOTH legs "
                         "(engine small-k config: 32)")
    ap.add_argument("--pre-blk", type=int, default=8192,
                    help="stock leg's pre-pass block (engine auto: 16384)")
    ap.add_argument("--dtypes", default="int8,bfloat16")
    ap.add_argument("--kscans", default="24,112")
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
        jax.block_until_ready(x)
        if args.sweep_block:
            for k_scan in (24, 112):
                print(f"{dtype} k_scan={k_scan} block sweep:", flush=True)
                out.extend(sweep_block(x, aux, valid, q, k_scan,
                                       interpret=args.interpret))
            continue
        for k_scan in [int(s) for s in args.kscans.split(",")]:
            for variant in ("plain", "skip"):
                ms_stock, ms_fused = run_pair(
                    x, aux, valid, q, k_scan, metric="cosine",
                    interpret=args.interpret, variant=variant,
                    frac=args.frac, pre_blk=args.pre_blk)
                if args.interpret:
                    print(f"{dtype} k_scan={k_scan} {variant}: "
                          f"bit-exact OK (interpret)")
                    continue
                print(f"{dtype} k_scan={k_scan} {variant} frac={args.frac} "
                      f"pre_blk={args.pre_blk}: stock "
                      f"{ms_stock:.2f} ms, theta-gated {ms_fused:.2f} ms "
                      f"({(ms_stock / ms_fused - 1) * 100:+.1f}%)",
                      flush=True)
                out.append({"exp": "kexp20", "dtype": dtype,
                            "k_scan": k_scan, "variant": variant,
                            "frac": args.frac, "pre_blk": args.pre_blk,
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
