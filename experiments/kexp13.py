"""Decompose the top-100 full-path overhead beyond the kernel: rescore
gather+einsum, submax pre-pass, and glue, measured separately on hardware.

  python experiments/kexp13.py [--dtype int8]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULTS = Path(__file__).resolve().parent / "kexp_results.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--kscan", type=int, default=112)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops import pallas_topk as P

    @functools.partial(jax.jit, static_argnames=("start", "rows_n"))
    def make(start, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, args.dim), jnp.float32)
        return D.prepare_rows(rows_f, metric="cosine", dtype=args.dtype)

    xs, auxs = [], []
    for start in range(0, args.rows, 1 << 20):
        r, a = make(start, min(1 << 20, args.rows - start))
        xs.append(r)
        auxs.append(a)
    x = jnp.concatenate(xs) if len(xs) > 1 else xs[0]
    aux = jnp.concatenate(auxs) if len(auxs) > 1 else auxs[0]
    valid = jnp.ones((args.rows,), bool)
    aux2d = aux.reshape(1, -1)
    mask2d = jnp.zeros((1, args.rows), jnp.float32)

    rng = np.random.default_rng(42)
    qf = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    q = jnp.asarray(qf)
    q_scan = D.prepare_queries(q, metric="cosine",
                               quantize=args.dtype == "int8")
    jax.block_until_ready((x, q, q_scan))

    def _sync(r):
        # block_until_ready is a no-op over the tunnel; force a readback.
        leaf = jax.tree_util.tree_leaves(r)[-1]
        np.asarray(leaf).ravel()[:1]

    def timeit(fn, *a, reps=None):
        reps = reps or args.iters
        r = fn(*a)
        for _ in range(8):
            r = fn(*a)
        _sync(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        _sync(r)
        return round((time.perf_counter() - t0) / reps * 1e3, 3)

    n_sample = 131072
    submax = jax.jit(functools.partial(
        P.sampled_submax, metric="cosine", precision_name="fast"))
    # Slice ONCE: an eager per-call x[:n] is 3 tunnel dispatches + a
    # 100 MB device copy per iteration (in the engine the slice fuses
    # into the jitted search program).
    xs_, as_, vs_ = x[:n_sample], aux[:n_sample], valid[:n_sample]
    ms_submax = timeit(lambda: submax(xs_, as_, vs_, q_scan))
    sub = submax(xs_, as_, vs_, q_scan)

    thr = jax.jit(functools.partial(
        D.threshold_from_submax, k=args.kscan, approx=True))
    ms_thr = timeit(lambda: thr(sub))
    t0v = thr(sub)

    kern = jax.jit(functools.partial(
        P._fused_call_db, k=args.kscan, metric="cosine", block_rows=2048,
        b_tile=256, precision_name="fast", interpret=False))
    offset = jnp.zeros((1,), jnp.int32)
    ms_kern = timeit(lambda: kern(x, aux2d, mask2d, q_scan, offset, t0v))
    _, cand = kern(x, aux2d, mask2d, q_scan, offset, t0v)
    jax.block_until_ready(cand)

    resc = jax.jit(functools.partial(D.rescore, k=args.k, metric="cosine"))
    ms_resc = timeit(lambda: resc(x, aux, valid, q, cand))

    out = {"submax_ms": ms_submax, "threshold_ms": ms_thr,
           "kernel_ms": ms_kern, "rescore_ms": ms_resc,
           "sum_ms": round(ms_submax + ms_thr + ms_kern + ms_resc, 3)}
    print(json.dumps(out), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp13-rescore-decomp",
                            "dtype": args.dtype, "batch": args.batch,
                            "kscan": args.kscan, "results": out}) + "\n")


if __name__ == "__main__":
    main()
