"""kexp15: sampled-floor A/B for int8 dot/l2 (floor newly enabled —
deterministic integer scores need no accumulation margin).

Usage:
  python experiments/kexp15.py [--rows 1048576] [--dim 768] [--batch 256]

Measures, in ONE process (same tunnel state), QPS with VROD_THETA0=0/1
for metric in (dot, l2) x k in (16, 100), int8. The env toggle is part of
the engine's program-cache key, so each setting traces a fresh program.
Appends one JSON line per point to experiments/kexp_results.jsonl.
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


def build(metric, rows, dim, dtype="int8"):
    import jax
    import jax.numpy as jnp
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.ops import distances as D
    from vrod_tpu.parallel.mesh import row_sharding, vec_sharding

    cfg = CollectionConfig(name=f"k15{metric}", dim=dim, metric=metric,
                           dtype=dtype, segment_rows=65536, shards=1)
    eng = DeviceEngine(cfg)
    eng.ensure_capacity(rows)
    xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("rows_n",),
                       out_shardings=(xs, vs, vs))
    def fill(x, aux, valid, start, *, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, dim), dtype=jnp.float32)
        r, a = D.prepare_rows(rows_f, metric=metric, dtype=x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, r, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, a, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    chunk = min(rows, 1 << 20)
    for start in range(0, rows, chunk):
        eng.x, eng.aux, eng.valid = fill(
            eng.x, eng.aux, eng.valid, start,
            rows_n=min(chunk, rows - start))
    eng.rebuild_norms()  # direct fill bypasses write(); int8+l2 needs it
    jax.block_until_ready(eng.x)
    return eng


def timed_qps(eng, q, k, iters=120):
    # Pipelined async dispatch, one readback; warm-up + first-loop ramp.
    for _ in range(6):
        v, ix = eng.search(q, k, as_numpy=False)
    np.asarray(ix[0, :1])
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            v, ix = eng.search(q, k, as_numpy=False)
        np.asarray(ix)
        dt = min(dt, time.perf_counter() - t0)
    return q.shape[0] * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    from vrod_tpu.parallel.mesh import replicated
    rng = np.random.default_rng(42)

    out = []
    for metric in ("dot", "l2"):
        eng = build(metric, args.rows, args.dim)
        q = jax.device_put(
            rng.standard_normal((args.batch, args.dim)).astype(np.float32),
            replicated(eng.mesh))
        jax.block_until_ready(q)
        for k in (16, 100):
            for theta in ("0", "1"):
                os.environ["VROD_THETA0"] = theta
                qps = timed_qps(eng, q, k)
                # exactness spot check vs the exact scan oracle
                ve, _ = eng.search(q[:8], k)
                vo, _ = eng.search(q[:8], k, impl="scan", precision="exact",
                                   rescore=False)
                lower = metric == "l2"
                kth = vo[:, k - 1:k]
                scale = np.maximum(np.abs(kth), 1.0)
                rec = float(((ve <= kth + 1e-5 * scale) if lower
                             else (ve >= kth - 1e-5 * scale)).mean())
                rec_s = f"{rec:.4f}"
                print(f"{metric} k={k} theta0={theta}: {qps:,.0f} QPS "
                      f"recall={rec_s}", flush=True)
                out.append({"exp": "kexp15", "metric": metric, "k": k,
                            "theta0": theta, "qps": round(qps, 1),
                            "recall": rec, "rows": args.rows,
                            "dim": args.dim, "batch": args.batch})
        del eng
    os.environ["VROD_THETA0"] = "1"
    with open(os.path.join(os.path.dirname(__file__),
                           "kexp_results.jsonl"), "a") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
