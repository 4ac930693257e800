"""Kernel experiment round B: carry-in-scratch-refs vs carried-values.

Hypothesis: the ~1.1 ms fixed cost + 0.037 ms/k_scan variable cost of the
extraction loop (measured by kexp.py sweep3b) is partly while/fori carry
copies of the (B, k) top-k state. This variant keeps (cv, ci) in VMEM
scratch refs mutated in place; the while loop carries only two (B, 1)
scalars-per-query and the fori carries nothing.

  python experiments/kexp2.py --kscan 16 --dtype bfloat16
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


def make_call(*, k, metric, block_rows, precision_name, tiles=1):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    precision = {"exact": lax.Precision.HIGHEST, "high": lax.Precision.HIGH,
                 "fast": lax.Precision.DEFAULT}[precision_name]

    def kernel(offset_ref, q_ref, x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
               cnt_ref, xbuf, abuf, mbuf, sems, *, nblocks):
        cnt_ref[0] = 0
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

        INT_MAX = np.int32(2**31 - 1)

        def block_loop(j, carry):
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
            aux = abuf[cur][0, :]
            mask = mbuf[cur][0, :]
            if metric == "cosine":
                s = g * aux[None, :]
            elif metric == "l2":
                s = 2.0 * g - aux[None, :]
            else:
                s = g
            s = s + mask[None, :]
            col_full = col_local + (j * block_rows + offset)

            # Per-batch-tile extraction: each sublane slice of g queries
            # runs its own while loop, so a late block where only one
            # query improves costs g-row passes, not B-row passes. Each
            # tile's carry is its own fori-carry entry (Mosaic lowers
            # neither sub-sliced ref writes nor dynamic_slice of values).
            b_all = s.shape[0]
            g = b_all // tiles
            new_carry = []
            for t in range(tiles):
                st = s[t * g:(t + 1) * g]
                col = col_full[t * g:(t + 1) * g]
                # built directly: slicing a narrow-lane (B, k) iota on the
                # sublane axis trips Mosaic's layout checks
                kio = lax.broadcasted_iota(jnp.int32, (g, k), 1)

                m0 = jnp.max(st, axis=1, keepdims=True)
                a0 = jnp.full(m0.shape, -2**30, jnp.int32)

                def cond(state):
                    m, a, cv, ci = state
                    return jnp.any(m > cv[:, k - 1:k])

                def body(state, st=st, col=col, kio=kio):
                    if os.environ.get("KEXP_COUNT") == "1":
                        cnt_ref[0] = cnt_ref[0] + 1
                    m, a, cv, ci = state
                    theta = cv[:, k - 1:k]
                    am = jnp.min(
                        jnp.where((st == m) & (col > a), col, INT_MAX),
                        axis=1, keepdims=True)
                    has = m > theta
                    pos = jnp.sum((cv >= m).astype(jnp.int32), axis=1,
                                  keepdims=True)
                    shift_v = pltpu.roll(cv, 1, 1)
                    shift_i = pltpu.roll(ci, 1, 1)
                    ins_v = jnp.where(kio < pos, cv,
                                      jnp.where(kio == pos, m, shift_v))
                    ins_i = jnp.where(kio < pos, ci,
                                      jnp.where(kio == pos, am, shift_i))
                    cv = jnp.where(has, ins_v, cv)
                    ci = jnp.where(has, ins_i, ci)
                    nxt_mask = (st < m) | ((st == m) & (col > am))
                    m_next = jnp.max(jnp.where(nxt_mask, st, NEG_INF),
                                     axis=1, keepdims=True)
                    a_next = jnp.where(m_next == m, am,
                                       jnp.full_like(am, -2**30))
                    return m_next, a_next, cv, ci

                if os.environ.get("KEXP_NOWHILE") == "1":
                    cv_t = jnp.maximum(carry[2 * t], m0)  # keep deps alive
                    ci_t = carry[2 * t + 1]
                else:
                    _, _, cv_t, ci_t = lax.while_loop(
                        cond, body, (m0, a0, carry[2 * t], carry[2 * t + 1]))
                new_carry += [cv_t, ci_t]
            return tuple(new_carry)

        b_all = ov_ref.shape[0]
        g0 = b_all // tiles
        init = []
        for _t in range(tiles):
            init += [jnp.full((g0, ov_ref.shape[1]), NEG_INF, jnp.float32),
                     jnp.full((g0, oi_ref.shape[1]), -1, jnp.int32)]
        final = lax.fori_loop(0, nblocks, block_loop, tuple(init))
        if tiles == 1:
            ov_ref[:] = final[0]
            oi_ref[:] = final[1]
        else:
            for t in range(tiles):
                ov_ref[t * g0:(t + 1) * g0, :] = final[2 * t]
                oi_ref[t * g0:(t + 1) * g0, :] = final[2 * t + 1]

    @jax.jit
    def call(x, aux2d, mask2d, q, offset):
        n, d = x.shape
        b = q.shape[0]
        nblocks = n // block_rows
        vals, idx, cnt = pl.pallas_call(
            functools.partial(kernel, nblocks=nblocks),
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
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
        return vals, idx, cnt

    return call


def main():
    from experiments.kexp import fill_device  # reuse device fill
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--kscan", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block-rows", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--precision", default="fast")
    ap.add_argument("--tiles", type=int, default=1)
    ap.add_argument("--tag", default="refcarry")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    x, aux2d, mask2d = fill_device(args.rows, args.dim, args.dtype)
    jax.block_until_ready(x)
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((args.batch, args.dim)),
                    dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    offset = jnp.zeros((1,), jnp.int32)
    _ = np.asarray(jnp.sum(q))

    call = make_call(k=args.kscan, metric="cosine",
                     block_rows=args.block_rows,
                     precision_name=args.precision, tiles=args.tiles)
    t0 = time.time()
    vals, idx, cnt = call(x, aux2d, mask2d, q, offset)
    np.asarray(vals)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        vals, idx, cnt = call(x, aux2d, mask2d, q, offset)
    idx_h = np.asarray(idx)
    iter_count = int(np.asarray(cnt)[0])
    dt = (time.perf_counter() - t0) / args.iters

    # correctness vs production nostore kernel
    from vrod_tpu.ops.pallas_topk import fused_topk
    valid = jnp.ones((args.rows,), jnp.bool_)
    aux1d = aux2d.reshape(-1)
    v2, i2 = fused_topk(x, aux1d, valid, q, k=args.kscan, metric="cosine",
                        block_rows=args.block_rows,
                        precision_name=args.precision)
    match = bool((np.asarray(i2) == idx_h).all())

    rec = {"variant": f"nostore_ref_t{args.tiles}", "rows": args.rows, "dim": args.dim,
           "batch": args.batch, "k_scan": args.kscan, "dtype": args.dtype,
           "block_rows": args.block_rows, "precision": args.precision,
           "ms_per_batch": round(dt * 1e3, 3),
           "qps": round(args.batch / dt, 1),
           "compile_s": round(compile_s, 1), "matches_base": match,
           "while_iterations": iter_count,
           "tag": args.tag}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
