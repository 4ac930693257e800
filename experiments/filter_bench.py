"""Filtered-search overhead at 1M x 768 on TPU.

Measures: mask build cost (host id list -> device bool mask), and search
QPS with a reused filter mask (the steady-state pattern: callers keep the
mask for repeated queries; the engine treats it as data).

  python experiments/filter_bench.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULTS = Path(__file__).resolve().parent / "kexp_results.jsonl"


def main():
    import jax
    from bench import tpu_qps  # noqa: F401  (import keeps bench warm-path shared)
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.parallel.mesh import replicated, row_sharding, vec_sharding
    import functools
    import jax.numpy as jnp
    from vrod_tpu.ops import distances as D

    n_rows, dim, B, k = 1 << 20, 768, 256, 16
    cfg = CollectionConfig(name="fb", dim=dim, metric="cosine",
                           dtype="bfloat16", segment_rows=65536)
    eng = DeviceEngine(cfg)
    eng.ensure_capacity(n_rows)
    xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("start", "rows_n"),
                       out_shardings=(xs, vs, vs))
    def fill(x, aux, valid, *, start, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, dim), dtype=jnp.float32)
        rows, aux_v = D.prepare_rows(rows_f, metric="cosine", dtype=x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, rows, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, aux_v, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    for start in range(0, n_rows, 1 << 20):
        eng.x, eng.aux, eng.valid = fill(eng.x, eng.aux, eng.valid,
                                         start=start, rows_n=1 << 20)
    jax.block_until_ready(eng.x)

    rng = np.random.default_rng(1)
    q = jax.device_put(
        rng.standard_normal((B, dim)).astype(np.float32),
        replicated(eng.mesh))
    jax.block_until_ready(q)
    _ = np.asarray(jnp.sum(q))

    def timed_qps(fmask, iters=40):
        v, i = eng.search(q, k, as_numpy=False, filter_mask=fmask)
        for _ in range(5):
            v, i = eng.search(q, k, as_numpy=False, filter_mask=fmask)
        np.asarray(i[0, :1])
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i = eng.search(q, k, as_numpy=False, filter_mask=fmask)
        np.asarray(i)
        dt = (time.perf_counter() - t0) / iters
        return B / dt, dt * 1e3, i

    qps0, lat0, _ = timed_qps(None)

    deny = rng.choice(n_rows, size=100_000, replace=False).astype(np.int64)
    t0 = time.perf_counter()
    mask = eng.filter_mask_from_slots(deny, mode="exclude")
    jax.block_until_ready(mask)
    build_cold_ms = (time.perf_counter() - t0) * 1e3  # includes jit compile
    deny2 = rng.choice(n_rows, size=100_000, replace=False).astype(np.int64)
    t0 = time.perf_counter()
    for _ in range(10):
        m2 = eng.filter_mask_from_slots(deny2, mode="exclude")
    jax.block_until_ready(m2)
    build_ms = (time.perf_counter() - t0) * 1e2  # warm, per build
    qps1, lat1, i1 = timed_qps(mask)
    assert not (np.isin(np.asarray(i1).ravel(), deny)).any(), \
        "excluded slots leaked"

    allow = rng.choice(n_rows, size=10_000, replace=False).astype(np.int64)
    mask2 = eng.filter_mask_from_slots(allow, mode="within")
    qps2, lat2, i2 = timed_qps(mask2)
    assert np.isin(np.asarray(i2).ravel(), allow).all(), \
        "allowlist violated"

    rec = {"variant": "filtered_search", "rows": n_rows, "dim": dim,
           "batch": B, "k": k, "dtype": "bfloat16",
           "unfiltered_qps": round(qps0, 1),
           "exclude100k_qps": round(qps1, 1),
           "within10k_qps": round(qps2, 1),
           "mask_build_100k_ms": round(build_ms, 2),
           "mask_build_cold_ms": round(build_cold_ms, 2),
           "latency_ms": [round(lat0, 2), round(lat1, 2), round(lat2, 2)],
           "tag": "filter-bench"}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
