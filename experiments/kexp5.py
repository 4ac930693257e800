"""Round-2b extraction experiments: unrolled multi-extract per while
iteration in the zero-store extraction loop.

Hypothesis: per-iteration cost (~0.65 us at blk 2048, B=256) is part VPU
passes, part Mosaic while-loop plumbing (cond eval, branch, carried state).
Unrolling the body E times keeps the passes-per-extraction constant but
divides the plumbing by E. If plumbing is a large fraction, unroll2/4 wins;
if passes dominate, it's a wash (and slightly negative from overshoot waste
once all queries are done mid-unroll).

Also sweeps block_rows 4096 for bf16 (fits the 2x double-buffer in VMEM at
6 MB/block): halves the number of while-loop entries (~2 us/block fixed
cost) at the price of 2x-wide extraction passes.

Usage (TPU tunnel):
  python experiments/kexp5.py --variants nostore,unroll2,unroll4 \
      --kscan 24 --dtype bfloat16
"""

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULTS = Path(__file__).resolve().parent / "kexp_results.jsonl"
NEG_INF = float("-inf")
_COL_SENTINEL = -(2 ** 30)


def build_kernel(variant, *, k, block_rows, nblocks, precision):
    import jax.numpy as jnp
    from jax import lax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    unroll = {"nostore": 1, "unroll2": 2, "unroll4": 4}[variant]

    def kernel(offset_ref, q_ref, x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
               xbuf, abuf, mbuf, sems):
        offset = offset_ref[0]
        kiota = lax.broadcasted_iota(jnp.int32, ov_ref.shape, 1)
        q = q_ref[:]
        col_local = lax.broadcasted_iota(
            jnp.int32, (q.shape[0], block_rows), 1)

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

        def insert_one(cv, ci, m, am, has):
            pos = jnp.sum((cv >= m).astype(jnp.int32), axis=1, keepdims=True)
            shift_v = pltpu.roll(cv, 1, 1)
            shift_i = pltpu.roll(ci, 1, 1)
            ins_v = jnp.where(kiota < pos, cv,
                              jnp.where(kiota == pos, m, shift_v))
            ins_i = jnp.where(kiota < pos, ci,
                              jnp.where(kiota == pos, am, shift_i))
            return jnp.where(has, ins_v, cv), jnp.where(has, ins_i, ci)

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

            g = lax.dot_general(
                q.astype(xbuf.dtype), xbuf[cur],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            s = g * abuf[cur][0, :][None, :] + mbuf[cur][0, :][None, :]
            col = col_local + (j * block_rows + offset)
            m0 = jnp.max(s, axis=1, keepdims=True)
            a0 = jnp.full(m0.shape, _COL_SENTINEL, jnp.int32)

            INT_MAX = np.int32(2 ** 31 - 1)

            def extract_once(state):
                m, a, cv, ci = state
                theta = cv[:, k - 1:k]
                am = jnp.min(jnp.where((s == m) & (col > a), col, INT_MAX),
                             axis=1, keepdims=True)
                has = m > theta
                cv, ci = insert_one(cv, ci, m, am, has)
                nxt_m = (s < m) | ((s == m) & (col > am))
                m_next = jnp.max(jnp.where(nxt_m, s, NEG_INF),
                                 axis=1, keepdims=True)
                a_next = jnp.where(m_next == m, am,
                                   jnp.full_like(am, _COL_SENTINEL))
                return m_next, a_next, cv, ci

            def cond(state):
                m, a, cv, ci = state
                return jnp.any(m > cv[:, k - 1:k])

            def body(state):
                for _ in range(unroll):
                    state = extract_once(state)
                return state

            _, _, cv, ci = lax.while_loop(cond, body, (m0, a0, cv, ci))
            return cv, ci

        init = (jnp.full(ov_ref.shape, NEG_INF, dtype=jnp.float32),
                jnp.full(oi_ref.shape, -1, dtype=jnp.int32))
        cv, ci = lax.fori_loop(0, nblocks, block_loop, init)
        ov_ref[:] = cv
        oi_ref[:] = ci

    return kernel


def make_call(variant, *, k, block_rows, precision_name):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    precision = {"exact": lax.Precision.HIGHEST, "high": lax.Precision.HIGH,
                 "fast": lax.Precision.DEFAULT}[precision_name]

    @jax.jit
    def call(x, aux2d, mask2d, q, offset):
        n, d = x.shape
        b = q.shape[0]
        nblocks = n // block_rows
        kernel = build_kernel(variant, k=k, block_rows=block_rows,
                              nblocks=nblocks, precision=precision)
        vals, idx = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((b, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((b, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, k), lambda i: (i, 0),
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
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d * x.dtype.itemsize + b * d * 4 + n * 8,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=os.environ.get("KEXP_INTERPRET") == "1",
        )(offset, q, x, aux2d, mask2d)
        return vals, idx

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="nostore,unroll2,unroll4")
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--kscan", type=int, default=24)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block-rows", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--precision", default="fast")
    ap.add_argument("--tag", default="unroll")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from experiments.kexp import fill_device
    print("devices:", jax.devices(), flush=True)

    x, aux2d, mask2d = fill_device(args.rows, args.dim, args.dtype)
    jax.block_until_ready(x)
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((args.batch, args.dim)),
                    dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    offset = jnp.zeros((1,), jnp.int32)
    jax.block_until_ready(q)
    t0 = time.time()
    _ = np.asarray(jnp.sum(q))
    print(f"first readback: {time.time() - t0:.1f}s", flush=True)

    ref_idx = None
    for variant in args.variants.split(","):
        variant = variant.strip()
        t0 = time.time()
        call = make_call(variant, k=args.kscan,
                         block_rows=args.block_rows,
                         precision_name=args.precision)
        vals, idx = call(x, aux2d, mask2d, q, offset)
        np.asarray(vals)
        compile_s = time.time() - t0

        t0 = time.perf_counter()
        for _ in range(args.iters):
            vals, idx = call(x, aux2d, mask2d, q, offset)
        idx_h = np.asarray(idx)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {
            "variant": variant, "rows": args.rows, "dim": args.dim,
            "batch": args.batch, "k_scan": args.kscan, "dtype": args.dtype,
            "block_rows": args.block_rows, "precision": args.precision,
            "ms_per_batch": round(dt * 1e3, 3),
            "qps": round(args.batch / dt, 1),
            "compile_s": round(compile_s, 1),
            "tag": args.tag,
        }
        if ref_idx is None:
            ref_idx = idx_h
        else:
            rec["matches_base"] = bool((idx_h == ref_idx).all())
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
