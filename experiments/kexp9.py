"""Sampled-floor FRACTION sweep at top-100: the floor from a 1/frac prefix
sample bounds the population ~(frac*k)-th score, so extraction work scales
with frac — a larger sample costs pre-pass stream but collapses the
extraction loop. Finds the sweet spot. Same-session A/B.

  python experiments/kexp9.py
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--margin", type=int, default=4)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import device_recall_probe
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.ops import distances as D
    from vrod_tpu.parallel.mesh import replicated, row_sharding, vec_sharding

    cfg = CollectionConfig(name="kexp9", dim=args.dim, metric="cosine",
                           dtype=args.dtype, segment_rows=65536, shards=1)
    eng = DeviceEngine(cfg)
    eng.ensure_capacity(args.rows)
    xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("rows_n",),
                       out_shardings=(xs, vs, vs))
    def fill(x, aux, valid, start, *, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, args.dim), dtype=jnp.float32)
        rows, aux_v = D.prepare_rows(rows_f, metric="cosine", dtype=x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, rows, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, aux_v, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    chunk = min(args.rows, 1 << 20)
    for start in range(0, args.rows, chunk):
        eng.x, eng.aux, eng.valid = fill(
            eng.x, eng.aux, eng.valid, start,
            rows_n=min(chunk, args.rows - start))
    jax.block_until_ready(eng.x)

    rng = np.random.default_rng(42)
    q = jax.device_put(
        rng.standard_normal((256, args.dim)).astype(np.float32),
        replicated(eng.mesh))
    jax.block_until_ready(q)

    def measure(frac):
        os.environ["VROD_THETA0"] = "1"
        os.environ["VROD_THETA0_MARGIN"] = "2e-4"
        os.environ["VROD_THETA0_FRAC"] = str(frac)
        v, i = eng.search(q, args.k, margin=args.margin)
        for _ in range(5):
            v, i = eng.search(q, args.k, as_numpy=False, margin=args.margin)
        np.asarray(i[0, :1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v, i = eng.search(q, args.k, as_numpy=False, margin=args.margin)
        np.asarray(i)
        dt = (time.perf_counter() - t0) / args.iters
        recall = device_recall_probe(eng, q[:8], args.k, margin=args.margin)
        return round(256 / dt, 1), round(dt * 1e3, 2), recall

    out = {}
    for frac in (8, 6, 4, 3, 2, 1):
        qps, ms, recall = measure(frac)
        out[str(frac)] = {"qps": qps, "ms": ms, "recall": recall}
        print(f"frac={frac}", out[str(frac)], flush=True)
    qps, ms, recall = measure(8)  # bracket drift
    out["8-recheck"] = {"qps": qps, "ms": ms, "recall": recall}
    print("8-recheck", out["8-recheck"], flush=True)

    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp9-floor-frac-sweep",
                            "rows": args.rows, "dtype": args.dtype,
                            "k": args.k, "margin": args.margin,
                            "results": out}) + "\n")


if __name__ == "__main__":
    main()
