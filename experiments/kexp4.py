"""Rescore-gather formulations: the top-100 path spends ~4 ms gathering
(B, k') candidate rows from HBM. Measure alternatives on hardware.

  python experiments/kexp4.py
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULTS = Path(__file__).resolve().parent / "kexp_results.jsonl"


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from experiments.kexp import fill_device

    N, dim, B, KP = 1 << 20, 768, 256, 144
    x, aux2d, mask2d = fill_device(N, dim, "bfloat16")
    aux = aux2d.reshape(-1)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, dim)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, size=(B, KP)), dtype=jnp.int32)
    jax.block_until_ready(x)
    _ = np.asarray(jnp.sum(q))

    @jax.jit
    def rescore_getitem(x, aux, q, idx):
        rows = x[idx]
        g = jnp.einsum("bkd,bd->bk", rows.astype(jnp.float32), q,
                       precision=lax.Precision.HIGHEST)
        return g * aux[idx]

    @jax.jit
    def rescore_take_flat(x, aux, q, idx):
        rows = jnp.take(x, idx.reshape(-1), axis=0).reshape(B, KP, dim)
        g = jnp.einsum("bkd,bd->bk", rows.astype(jnp.float32), q,
                       precision=lax.Precision.HIGHEST)
        return g * aux[idx]

    @jax.jit
    def rescore_sorted(x, aux, q, idx):
        flat = idx.reshape(-1)
        order = jnp.argsort(flat)
        sorted_idx = flat[order]
        rows = jnp.take(x, sorted_idx, axis=0, indices_are_sorted=True)
        # invert the permutation
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.size, dtype=order.dtype))
        rows = rows[inv].reshape(B, KP, dim)
        g = jnp.einsum("bkd,bd->bk", rows.astype(jnp.float32), q,
                       precision=lax.Precision.HIGHEST)
        return g * aux[idx]

    @jax.jit
    def rescore_lowprec(x, aux, q, idx):
        # HIGH (3-pass bf16) instead of HIGHEST (6-pass): is the einsum,
        # not the gather, the cost?
        rows = x[idx]
        g = jnp.einsum("bkd,bd->bk", rows.astype(jnp.float32), q,
                       precision=lax.Precision.HIGH)
        return g * aux[idx]

    @jax.jit
    def gather_only(x, q, idx):
        return x[idx].astype(jnp.float32).sum(axis=2)  # forces the gather

    for name, fn, args in [
        ("rescore_getitem", rescore_getitem, (x, aux, q, idx)),
        ("rescore_take_flat", rescore_take_flat, (x, aux, q, idx)),
        ("rescore_sorted", rescore_sorted, (x, aux, q, idx)),
        ("rescore_lowprec", rescore_lowprec, (x, aux, q, idx)),
        ("gather_only", gather_only, (x, q, idx)),
    ]:
        r = fn(*args)
        np.asarray(r[0, :1])
        # warm ramp
        for _ in range(5):
            r = fn(*args)
        np.asarray(r[0, :1])
        t0 = time.perf_counter()
        for _ in range(40):
            r = fn(*args)
        np.asarray(r[0, :1])
        dt = (time.perf_counter() - t0) / 40
        rec = {"variant": name, "rows": N, "dim": dim, "batch": B,
               "k_scan": KP, "dtype": "bfloat16",
               "ms_per_batch": round(dt * 1e3, 3), "tag": "rescore-gather"}
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
