"""dot/l2 sampled-floor A/B at 1M x 768 top-100 (the floor extension of
round 3): VROD_THETA0 on/off through the engine, recall probed on device.

  python experiments/kexp11.py [--dtype bfloat16]
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
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import device_recall_probe
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.ops import distances as D
    from vrod_tpu.parallel.mesh import replicated, row_sharding, vec_sharding

    out = {}
    for metric in ("dot", "l2"):
        cfg = CollectionConfig(name=f"kexp11{metric}", dim=args.dim,
                               metric=metric, dtype=args.dtype,
                               segment_rows=65536, shards=1)
        eng = DeviceEngine(cfg)
        eng.ensure_capacity(args.rows)
        xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                           static_argnames=("rows_n",),
                           out_shardings=(xs, vs, vs))
        def fill(x, aux, valid, start, *, rows_n):
            key = jax.random.PRNGKey(start)
            rows_f = jax.random.normal(key, (rows_n, args.dim),
                                       dtype=jnp.float32)
            r, a = D.prepare_rows(rows_f, metric=metric, dtype=x.dtype)
            x = jax.lax.dynamic_update_slice_in_dim(x, r, start, 0)
            aux = jax.lax.dynamic_update_slice_in_dim(aux, a, start, 0)
            valid = jax.lax.dynamic_update_slice_in_dim(
                valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
            return x, aux, valid

        chunk = min(args.rows, 1 << 20)
        for start in range(0, args.rows, chunk):
            eng.x, eng.aux, eng.valid = fill(
                eng.x, eng.aux, eng.valid, start,
                rows_n=min(chunk, args.rows - start))
        eng.rebuild_norms()  # direct fill bypasses write(); int8+l2 needs it
        jax.block_until_ready(eng.x)

        rng = np.random.default_rng(42)
        q = jax.device_put(
            rng.standard_normal((256, args.dim)).astype(np.float32),
            replicated(eng.mesh))
        jax.block_until_ready(q)

        for theta in ("0", "1"):
            os.environ["VROD_THETA0"] = theta
            v, i = eng.search(q, args.k)
            for _ in range(5):
                v, i = eng.search(q, args.k, as_numpy=False)
            np.asarray(i[0, :1])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                v, i = eng.search(q, args.k, as_numpy=False)
            np.asarray(i)
            dt = (time.perf_counter() - t0) / args.iters
            recall = device_recall_probe(eng, q[:8], args.k)
            key = f"{metric}-floor{theta}"
            out[key] = {"qps": round(256 / dt, 1),
                        "ms": round(dt * 1e3, 2), "recall": recall}
            print(key, out[key], flush=True)
        del eng

    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp11-dot-l2-floor-ab",
                            "rows": args.rows, "dtype": args.dtype,
                            "k": args.k, "results": out}) + "\n")


if __name__ == "__main__":
    main()
