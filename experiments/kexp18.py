"""kexp18 (VERDICT r4 item 4b): gate the per-block extraction while-loop
behind ``pl.when`` — "count-then-extract" in its cheapest sound form.

Hypothesis: with a warm carry / sampled floor, the overwhelming majority
of blocks contribute nothing; today each still pays the Mosaic while-loop
ENTRY (cond evaluation + loop machinery). A (B,1) any-reduce of
``m0 > theta`` is already computed for the cond — hoisting it into a
``pl.when`` that skips the whole while construct tests whether Mosaic's
predicated-region entry is cheaper than its while entry. Exactness is
untouched: the predicate is exactly the first cond.

Kernel-level A/B (stock ``fused_topk`` vs the gated variant, same
process, same inputs, identical results asserted bit-exact) at
k_scan in (24, 112), int8 + bf16. Sync via tiny readbacks (the tunnel
postmortem: block_until_ready does not block over the tunnel).

Usage: python experiments/kexp18.py [--rows 1048576] [--dim 768]

PRODUCTIZED (round 5): ``fused_topk`` now gates by default (ref-carried
carry + pl.when in ops/pallas_topk.py), so this harness's "stock" leg
measures the SHIPPED gated kernel — a re-run should show ~0% and serves
as a regression guard, not an A/B.
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


def _extract_block_gated(s, col, cv, ci, k, kiota, theta0):
    """Same zero-store extraction as P._extract_block, but the while loop
    only EXISTS for blocks that beat theta (pl.when region instead of a
    first cond evaluation). Requires ref-carried state (pl.when has no
    value outputs), so the caller passes cv/ci as refs."""
    m0 = jnp.max(s, axis=1, keepdims=True)
    a0 = jnp.full(m0.shape, P._COL_SENTINEL, jnp.int32)

    def run(cv_ref, ci_ref):
        def cond(state):
            m, a = state
            return jnp.any(
                m > jnp.maximum(cv_ref[:, k - 1:k], theta0))

        def body(state):
            m, a = state
            cv, ci = cv_ref[:], ci_ref[:]
            theta = jnp.maximum(cv[:, k - 1:k], theta0)
            am = jnp.min(
                jnp.where((s == m) & (col > a), col, P._INT_MAX),
                axis=1, keepdims=True)
            has = m > theta
            cv, ci = P._insert_one(cv, ci, m, am, has, kiota)
            cv_ref[:] = cv
            ci_ref[:] = ci
            nxt = (s < m) | ((s == m) & (col > am))
            m_next = jnp.max(jnp.where(nxt, s, P.NEG_INF),
                             axis=1, keepdims=True)
            a_next = jnp.where(m_next == m, am,
                               jnp.full_like(am, P._COL_SENTINEL))
            return m_next, a_next

        lax.while_loop(cond, body, (m0, a0))

    return run, jnp.any(m0 > jnp.maximum(cv[:, k - 1:k], theta0))


def _kernel_db_gated(offset_ref, q_ref, t0_ref, *rest, metric, k,
                     block_rows, nblocks, precision):
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
        nxt = (j + 1) % 2

        @pl.when(j + 1 < nblocks)
        def _():
            for d in get_dma(nxt, j + 1):
                d.start()

        for d in get_dma(cur, j):
            d.wait()

        g = P._block_dot(q, xbuf[cur], precision)
        s = P._epilogue(g, abuf[cur][0, :], mbuf[cur][0, :], metric,
                        quantized=xbuf.dtype == jnp.int8)
        col = col_local + (j * block_rows + offset)
        run, contributes = _extract_block_gated(
            s, col, cv_ref[:], ci_ref[:], k, kiota, theta0)

        @pl.when(contributes)
        def _():
            run(cv_ref, ci_ref)

        return 0

    lax.fori_loop(0, nblocks, block_loop, 0)
    ov_ref[:] = cv_ref[:]
    oi_ref[:] = ci_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "b_tile",
                     "precision_name", "interpret"))
def fused_gated(x, aux2d, mask2d, q, offset, theta0, *, k, metric,
                block_rows, b_tile, precision_name, interpret):
    n, d = x.shape
    b = q.shape[0]
    nblocks = n // block_rows
    precision = P._PRECISIONS[precision_name]
    kernel = functools.partial(
        _kernel_db_gated, metric=metric, k=k, block_rows=block_rows,
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


def make_inputs(rows, dim, batch, dtype, seed=0, interpret=False):
    rng = np.random.default_rng(seed)
    xf = rng.standard_normal((rows, dim)).astype(np.float32)
    x, aux = D.prepare_rows(jnp.asarray(xf), metric="cosine",
                            dtype=jnp.dtype(dtype))
    valid = jnp.ones((rows,), bool)
    qf = rng.standard_normal((batch, dim)).astype(np.float32)
    if jnp.dtype(dtype) == jnp.int8:
        q = D.prepare_queries(jnp.asarray(qf), metric="cosine",
                              quantize=True)
    else:
        q = D.prepare_queries(jnp.asarray(qf), metric="cosine")
    return x, aux, valid, q


@functools.lru_cache(maxsize=None)
def _stock_jit(k_scan, pname, interpret):
    # Module-level jit cache (ADVICE r4): run_pair used to rebuild the
    # lambda per call, defeating jax's jit cache and recompiling the
    # identical stock program for every variant leg.
    return jax.jit(lambda xx, aa, vv, qq: P.fused_topk(
        xx, aa, vv, qq, k=k_scan, metric="cosine",
        precision_name=pname, interpret=interpret))


def run_pair(x, aux, valid, q, k_scan, *, interpret, iters=60):
    n, d = x.shape
    b = q.shape[0]
    block_rows = P.pick_block_rows(n, d, x.dtype.itemsize)
    aux2d = aux.reshape(1, n)
    mask2d = jnp.where(valid, 0.0, P.NEG_INF).astype(jnp.float32) \
        .reshape(1, n)
    offset = jnp.zeros((1,), jnp.int32)
    t0 = jnp.full((b, 1), P.NEG_INF, jnp.float32)
    pname = "fast"

    # Jit the stock leg: the gated leg is one jitted program, and calling
    # fused_topk eagerly pays per-op tunnel dispatch for its mask/aux prep
    # (~2x inflation of the baseline — the 2026-08-19 hardware run measured
    # stock 9.03 ms at k_scan 24 while the ENGINE's whole batch, which runs
    # this same kernel jitted plus rescore, measured 4.63 ms; those first
    # four kexp_results rows are SUPERSEDED by the post-jit-fix rows). The
    # engine always composes the kernel inside a jitted shard_map program.
    stock_jit = _stock_jit(k_scan, pname, interpret)

    def stock():
        return stock_jit(x, aux, valid, q)

    def gated():
        return fused_gated(x, aux2d, mask2d, q, offset, t0, k=k_scan,
                           metric="cosine", block_rows=block_rows,
                           b_tile=min(b, 256), precision_name=pname,
                           interpret=interpret)

    # Correctness first: identical results, bit-exact.
    vs, is_ = stock()
    vg, ig = gated()
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vg))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ig))
    if interpret:
        return None, None

    def timed(fn):
        for _ in range(4):
            v, i = fn()
        np.asarray(i[0, :1])  # sync
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(iters):
                v, i = fn()
            np.asarray(i[0, :1])
            best = min(best, time.perf_counter() - t)
        return best / iters * 1e3  # ms per call

    return timed(stock), timed(gated)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU correctness check only")
    args = ap.parse_args()

    rows = args.rows if not args.interpret else 8192
    out = []
    for dtype in ("int8", "bfloat16"):
        x, aux, valid, q = make_inputs(rows, args.dim, args.batch, dtype,
                                       interpret=args.interpret)
        jax.block_until_ready(x)
        for k_scan in (24, 112):
            ms_stock, ms_gated = run_pair(x, aux, valid, q, k_scan,
                                          interpret=args.interpret)
            if args.interpret:
                print(f"{dtype} k_scan={k_scan}: bit-exact OK (interpret)")
                continue
            print(f"{dtype} k_scan={k_scan}: stock {ms_stock:.2f} ms, "
                  f"when-gated {ms_gated:.2f} ms "
                  f"({(ms_stock / ms_gated - 1) * 100:+.1f}%)", flush=True)
            out.append({"exp": "kexp18", "dtype": dtype, "k_scan": k_scan,
                        "ms_stock": round(ms_stock, 3),
                        "ms_gated": round(ms_gated, 3),
                        "rows": rows, "dim": args.dim, "batch": args.batch})
    if out:
        with open(Path(__file__).parent / "kexp_results.jsonl", "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
