"""Kernel experiment round C: software-pipeline MXU vs VPU.

The extraction loop (VPU) and the distance matmul (MXU) run on different
units but the round-1/2 kernels serialize them per block: dot j -> extract
j -> dot j+1. This variant issues dot j+1 (into the alternate score buffer)
BEFORE extracting block j, so the MXU can retire the next block's matmul
while the VPU walks the current block's candidates. x DMAs use a 3-deep
ring (a manual DMA write must never land in a buffer the in-flight dot
still reads).

  python experiments/kexp3.py --kscan 16 --dtype bfloat16
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


def make_call(*, k, metric, block_rows, precision_name):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax import lax

    precision = {"exact": lax.Precision.HIGHEST, "high": lax.Precision.HIGH,
                 "fast": lax.Precision.DEFAULT}[precision_name]
    INT_MAX = np.int32(2**31 - 1)

    def kernel(offset_ref, q_ref, x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
               xbuf, abuf, mbuf, sbuf, sems, *, nblocks):
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

        def score(j):
            """dot block j (x already in VMEM) -> sbuf[j % 2]."""
            slot = j % 3
            g = lax.dot_general(
                q.astype(xbuf.dtype), xbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            aux = abuf[slot][0, :]
            mask = mbuf[slot][0, :]
            if metric == "cosine":
                s = g * aux[None, :]
            elif metric == "l2":
                s = 2.0 * g - aux[None, :]
            else:
                s = g
            sbuf[j % 2] = s + mask[None, :]

        def extract(j):
            s = sbuf[j % 2]
            col = col_local + (j * block_rows + offset)
            m0 = jnp.max(s, axis=1, keepdims=True)
            a0 = jnp.full(m0.shape, -2**30, jnp.int32)

            def cond(state):
                m, a = state
                return jnp.any(m > ov_ref[:, k - 1:k])

            def body(state):
                m, a = state
                cv = ov_ref[:]
                ci = oi_ref[:]
                theta = cv[:, k - 1:k]
                am = jnp.min(jnp.where((s == m) & (col > a), col, INT_MAX),
                             axis=1, keepdims=True)
                has = m > theta
                pos = jnp.sum((cv >= m).astype(jnp.int32), axis=1,
                              keepdims=True)
                shift_v = pltpu.roll(cv, 1, 1)
                shift_i = pltpu.roll(ci, 1, 1)
                ins_v = jnp.where(kiota < pos, cv,
                                  jnp.where(kiota == pos, m, shift_v))
                ins_i = jnp.where(kiota < pos, ci,
                                  jnp.where(kiota == pos, am, shift_i))
                ov_ref[:] = jnp.where(has, ins_v, cv)
                oi_ref[:] = jnp.where(has, ins_i, ci)
                nxt_mask = (s < m) | ((s == m) & (col > am))
                m_next = jnp.max(jnp.where(nxt_mask, s, NEG_INF),
                                 axis=1, keepdims=True)
                a_next = jnp.where(m_next == m, am,
                                   jnp.full_like(am, -2**30))
                return m_next, a_next

            lax.while_loop(cond, body, (m0, a0))

        ov_ref[:] = jnp.full(ov_ref.shape, NEG_INF, jnp.float32)
        oi_ref[:] = jnp.full(oi_ref.shape, -1, jnp.int32)

        # Prologue: fetch block 0, score it, start fetching 1 and 2.
        for d in get_dma(0, 0):
            d.start()
        if nblocks > 1:
            for d in get_dma(1, 1):
                d.start()
        for d in get_dma(0, 0):
            d.wait()
        score(0)
        if nblocks > 2:
            for d in get_dma(2, 2):
                d.start()

        def block_loop(j, carry):
            # Issue dot j+1 (MXU) before extracting j (VPU): the units
            # overlap because extract(j) reads sbuf[j%2] while score(j+1)
            # writes sbuf[(j+1)%2].
            @pl.when(j + 1 < nblocks)
            def _():
                for d in get_dma((j + 1) % 3, j + 1):
                    d.wait()
                score(j + 1)

            @pl.when(j + 3 < nblocks)
            def _():
                for d in get_dma((j + 3) % 3, j + 3):
                    d.start()

            extract(j)
            return carry

        lax.fori_loop(0, nblocks, block_loop, jnp.zeros((), jnp.int32))

    @jax.jit
    def call(x, aux2d, mask2d, q, offset):
        n, d = x.shape
        b = q.shape[0]
        nblocks = n // block_rows
        vals, idx = pl.pallas_call(
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
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((3, block_rows, d), x.dtype),
                pltpu.VMEM((3, 1, block_rows), jnp.float32),
                pltpu.VMEM((3, 1, block_rows), jnp.float32),
                pltpu.VMEM((2, b, block_rows), jnp.float32),
                pltpu.SemaphoreType.DMA((3, 3)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d * x.dtype.itemsize + b * d * 4 + n * 8,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=os.environ.get("KEXP_INTERPRET") == "1",
        )(offset, q, x, aux2d, mask2d)
        return vals, idx

    return call


def main():
    from experiments.kexp import fill_device
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--kscan", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block-rows", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--precision", default="fast")
    ap.add_argument("--tag", default="pipelined")
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
                     precision_name=args.precision)
    t0 = time.time()
    vals, idx = call(x, aux2d, mask2d, q, offset)
    np.asarray(vals)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        vals, idx = call(x, aux2d, mask2d, q, offset)
    idx_h = np.asarray(idx)
    dt = (time.perf_counter() - t0) / args.iters

    from vrod_tpu.ops.pallas_topk import fused_topk
    valid = jnp.ones((args.rows,), jnp.bool_)
    v2, i2 = fused_topk(x, aux2d.reshape(-1), valid, q, k=args.kscan,
                        metric="cosine", block_rows=args.block_rows,
                        precision_name=args.precision)
    match = bool((np.asarray(i2) == idx_h).all())

    rec = {"variant": "pipelined", "rows": args.rows, "dim": args.dim,
           "batch": args.batch, "k_scan": args.kscan, "dtype": args.dtype,
           "block_rows": args.block_rows, "precision": args.precision,
           "ms_per_batch": round(dt * 1e3, 3),
           "qps": round(args.batch / dt, 1),
           "compile_s": round(compile_s, 1), "matches_base": match,
           "tag": args.tag}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
