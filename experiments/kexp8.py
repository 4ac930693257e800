"""Config-3 (top-100) closing sweep: margin policy x sampled-floor margin,
full production path (Pallas scan + exact rescore) through the engine, with
the on-device recall probe per combo. Same-session A/B only.

  python experiments/kexp8.py [--rows 1048576] [--dtype bfloat16]
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

    cfg = CollectionConfig(name="kexp8", dim=args.dim, metric="cosine",
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
    qs = {}
    for b in (256, 512):
        qh = rng.standard_normal((b, args.dim)).astype(np.float32)
        qs[b] = jax.device_put(qh, replicated(eng.mesh))
    jax.block_until_ready(list(qs.values()))

    def measure(batch, margin, theta0, t0_margin):
        os.environ["VROD_THETA0"] = "1" if theta0 else "0"
        os.environ["VROD_THETA0_MARGIN"] = str(t0_margin)
        q = qs[batch]
        v, i = eng.search(q, args.k, margin=margin)  # compile + slow loop
        for _ in range(5):
            v, i = eng.search(q, args.k, as_numpy=False, margin=margin)
        np.asarray(i[0, :1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v, i = eng.search(q, args.k, as_numpy=False, margin=margin)
        np.asarray(i)
        dt = (time.perf_counter() - t0) / args.iters
        recall = device_recall_probe(eng, q[:8], args.k, margin=margin)
        return batch * args.iters / (dt * args.iters), dt * 1e3, recall

    combos = [
        # label, batch, margin(None=policy), theta0 on, floor margin
        ("A-default-112", 256, None, True, 1e-3),
        ("B-m8-108", 256, 8, True, 1e-3),
        ("C-m6-106", 256, 6, True, 1e-3),
        ("D-m6-106-tight", 256, 6, True, 2e-4),
        ("E-m6-106-nofloor", 256, 6, False, 1e-3),
        ("F-m4-104-tight", 256, 4, True, 2e-4),
    ]
    out = {}
    for label, batch, margin, theta0, t0m in combos:
        qps, lat, recall = measure(batch, margin, theta0, t0m)
        out[label] = {"qps": round(qps, 1), "ms": round(lat, 2),
                      "recall": recall}
        print(label, out[label], flush=True)

    # Best 256 combo re-run at batch 512.
    best = max(combos[1:], key=lambda c: out[c[0]]["qps"])
    qps, lat, recall = measure(512, best[2], best[3], best[4])
    out["best-512"] = {"qps": round(qps, 1), "ms": round(lat, 2),
                      "recall": recall, "base": best[0]}
    print("best-512", out["best-512"], flush=True)
    # Re-run A last to bracket tunnel drift within the session.
    qps, lat, recall = measure(256, None, True, 1e-3)
    out["A-recheck"] = {"qps": round(qps, 1), "ms": round(lat, 2),
                        "recall": recall}
    print("A-recheck", out["A-recheck"], flush=True)

    with open(RESULTS, "a") as f:
        f.write(json.dumps({"exp": "kexp8-config3-sweep",
                            "rows": args.rows, "dtype": args.dtype,
                            "k": args.k, "results": out}) + "\n")


if __name__ == "__main__":
    main()
