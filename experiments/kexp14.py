"""Threshold-method A/B at top-100 (engine full path): approx_max_k
(~0.85 ms at nsub 8192) vs pure-reduction minmax (~30 us, slightly looser
floor -> more extractions). Net effect decides the default.

  python experiments/kexp14.py --dtype int8
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
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import device_recall_probe
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.ops import distances as D
    from vrod_tpu.parallel.mesh import replicated, row_sharding, vec_sharding

    cfg = CollectionConfig(name="kexp14", dim=args.dim, metric="cosine",
                           dtype=args.dtype, segment_rows=65536, shards=1)
    eng = DeviceEngine(cfg)
    eng.ensure_capacity(args.rows)
    xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("rows_n",),
                       out_shardings=(xs, vs, vs))
    def fill(x, aux, valid, start, *, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, args.dim), jnp.float32)
        r, a = D.prepare_rows(rows_f, metric="cosine", dtype=x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, r, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, a, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    for start in range(0, args.rows, 1 << 20):
        eng.x, eng.aux, eng.valid = fill(
            eng.x, eng.aux, eng.valid, start,
            rows_n=min(1 << 20, args.rows - start))
    jax.block_until_ready(eng.x)

    rng = np.random.default_rng(42)
    qs = {}
    for b in (256, 512):
        qs[b] = jax.device_put(
            rng.standard_normal((b, args.dim)).astype(np.float32),
            replicated(eng.mesh))
    jax.block_until_ready(list(qs.values()))

    def measure(batch, method):
        os.environ["VROD_THETA0_METHOD"] = method
        q = qs[batch]
        v, i = eng.search(q, args.k)
        for _ in range(5):
            v, i = eng.search(q, args.k, as_numpy=False)
        np.asarray(i[0, :1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v, i = eng.search(q, args.k, as_numpy=False)
        np.asarray(i[0, :1])
        dt = (time.perf_counter() - t0) / args.iters
        recall = device_recall_probe(eng, q[:8], args.k)
        return {"qps": round(batch / dt, 1), "ms": round(dt * 1e3, 2),
                "recall": recall}

    out = {}
    for batch in (256, 512):
        for method in ("approx", "minmax"):
            out[f"b{batch}-{method}"] = measure(batch, method)
            print(f"b{batch}-{method}", out[f"b{batch}-{method}"],
                  flush=True)
    out["b256-approx-recheck"] = measure(256, "approx")
    print("b256-approx-recheck", out["b256-approx-recheck"], flush=True)

    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp14-threshold-method",
                            "dtype": args.dtype, "k": args.k,
                            "results": out}) + "\n")


if __name__ == "__main__":
    main()
