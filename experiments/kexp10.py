"""Batch-1 (config 1) latency attack: the fused Pallas kernel pays ~1.1 ms
Mosaic while-entry + per-dispatch overhead that dominates single-query
latency. A/B the XLA scan path (no while-loop entry) against the kernel at
small batches, plus the small-collection 100k x 128 point vs one CPU core.

  python experiments/kexp10.py
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


def build_engine(rows, dim, dtype):
    import jax
    import jax.numpy as jnp
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.ops import distances as D
    from vrod_tpu.parallel.mesh import row_sharding, vec_sharding

    cfg = CollectionConfig(name="kexp10", dim=dim, metric="cosine",
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
        r, a = D.prepare_rows(rows_f, metric="cosine", dtype=x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, r, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, a, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    chunk = min(rows, 1 << 20)
    for start in range(0, rows, chunk):
        eng.x, eng.aux, eng.valid = fill(eng.x, eng.aux, eng.valid, start,
                                         rows_n=min(chunk, rows - start))
    jax.block_until_ready(eng.x)
    return eng


def measure(eng, q, k, impl, iters=60):
    import jax
    v, i = eng.search(q, k, impl=impl)
    for _ in range(5):
        v, i = eng.search(q, k, as_numpy=False, impl=impl)
    np.asarray(i[0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        v, i = eng.search(q, k, as_numpy=False, impl=impl)
    np.asarray(i)
    dt = (time.perf_counter() - t0) / iters
    return round(dt * 1e3, 3)


def cpu_single(rows, dim, k, iters=30):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rows, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal((1, dim)).astype(np.float32)
    q /= np.linalg.norm(q)

    def scan():
        s = q @ x.T
        return np.argpartition(-s, k, axis=1)[:, :k]

    scan()
    t0 = time.perf_counter()
    for _ in range(iters):
        scan()
    return round((time.perf_counter() - t0) / iters * 1e3, 3)


def main():
    import jax
    from vrod_tpu.parallel.mesh import replicated

    out = {}
    rng = np.random.default_rng(42)

    for rows, dim, dtype, k in ((100_000, 128, "bfloat16", 10),
                                (1 << 20, 768, "bfloat16", 100)):
        eng = build_engine(rows, dim, dtype)
        tag = f"{rows}x{dim}"
        for b in (1, 8):
            q = jax.device_put(
                rng.standard_normal((b, dim)).astype(np.float32),
                replicated(eng.mesh))
            jax.block_until_ready(q)
            for impl in ("pallas", "scan"):
                ms = measure(eng, q, k, impl)
                out[f"{tag}-b{b}-{impl}"] = ms
                print(f"{tag} b={b} {impl}: {ms} ms", flush=True)
        del eng
    out["cpu-100kx128-b1-ms"] = cpu_single(100_000, 128, 10)
    print("cpu 100kx128 b1:", out["cpu-100kx128-b1-ms"], "ms", flush=True)

    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp10-batch1-scan-vs-pallas",
                            "results": out}) + "\n")


if __name__ == "__main__":
    main()
