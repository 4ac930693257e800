"""b_tile sweep at batch 512 top-100: b_tile=256 re-streams the collection
once per sub-tile; b_tile=512 streams once but pays a wider shared
extraction loop (max over 512 queries per while iteration). Isolated-kernel
A/B with and without the sampled floor.

  python experiments/kexp12.py [--dtype int8]
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
    ap.add_argument("--kscan", type=int, default=112)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops import pallas_topk as P

    @functools.partial(jax.jit, static_argnames=("start", "rows_n", "dtype"))
    def make(start, rows_n, dtype):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, args.dim), jnp.float32)
        return D.prepare_rows(rows_f, metric="cosine", dtype=dtype)

    def fill(dtype):
        xs, auxs = [], []
        chunk = 1 << 20
        for start in range(0, args.rows, chunk):
            r, a = make(start, min(chunk, args.rows - start), dtype)
            xs.append(r)
            auxs.append(a)
        x = jnp.concatenate(xs) if len(xs) > 1 else xs[0]
        aux = jnp.concatenate(auxs) if len(auxs) > 1 else auxs[0]
        return x, aux.reshape(1, args.rows), jnp.zeros((1, args.rows),
                                                       jnp.float32)

    out = {}
    rng = np.random.default_rng(42)
    for dtype in ("int8", "bfloat16"):
        x, aux2d, mask2d = fill(dtype)
        aux = aux2d.reshape(-1)
        valid = jnp.ones((args.rows,), bool)
        qf = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
        qf /= np.linalg.norm(qf, axis=1, keepdims=True)
        q = jnp.asarray(qf)
        if dtype == "int8":
            q_scan = D.prepare_queries(q, metric="cosine", quantize=True)
        else:
            q_scan = q
        jax.block_until_ready((x, q_scan))

        sub = P.sampled_submax(x[:131072], aux[:131072], valid[:131072],
                               q_scan, metric="cosine",
                               precision_name="fast")
        t0v = D.threshold_from_submax(sub, args.kscan, approx=True)
        jax.block_until_ready(t0v)
        offset = jnp.zeros((1,), jnp.int32)
        neg = jnp.full((args.batch, 1), float("-inf"), jnp.float32)

        def timeit(fn, *a, reps=None):
            # Over the axon tunnel block_until_ready does NOT block —
            # only a host readback forces the queue (kexp13 postmortem);
            # one small np.asarray per loop costs ~25 ms RTT, amortized
            # over reps like bench.py does.
            reps = reps or args.iters
            r = fn(*a)
            for _ in range(5):
                r = fn(*a)
            np.asarray(r[1][0, :1])
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(*a)
            np.asarray(r[1][0, :1])
            return (time.perf_counter() - t0) / reps * 1e3

        results = {}
        for bt in (256, 512):
            for label, theta in (("cold", neg), ("floor", t0v)):
                fn = functools.partial(
                    P._fused_call_db, k=args.kscan, metric="cosine",
                    block_rows=2048, b_tile=bt, precision_name="fast",
                    interpret=False)
                ms = timeit(fn, x, aux2d, mask2d, q_scan, offset, theta)
                v, i = fn(x, aux2d, mask2d, q_scan, offset, theta)
                results[f"bt{bt}-{label}"] = {
                    "ms": round(ms, 2),
                    "qps": round(args.batch / ms * 1e3, 1)}
                print(dtype, f"bt{bt}-{label}", results[f"bt{bt}-{label}"],
                      flush=True)
                if bt == 256 and label == "cold":
                    ref_i = np.asarray(i)
                else:
                    assert (np.asarray(i) == ref_i).all(), \
                        f"results diverge at {bt}-{label}"
        out[dtype] = results
        del x, aux2d, mask2d

    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp12-btile-512", "rows": args.rows,
                            "kscan": args.kscan, "batch": args.batch,
                            "results": out}) + "\n")


if __name__ == "__main__":
    main()
