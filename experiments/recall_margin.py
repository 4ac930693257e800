"""Validate rescore margins on the real TPU at full scale.

For each (k, margin) the production path (fast-precision Pallas scan +
exact rescore of k_scan = k_out + margin candidates) is probed against an
exact-precision full-collection oracle, on device (bench.device_recall_probe).
Output: the smallest margin per (dtype, k) with recall 1.0 — the data the
engine's default margin policy is derived from.

  python experiments/recall_margin.py --dtype bfloat16
"""

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

RESULTS = Path(__file__).resolve().parent / "recall_results.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--metric", default="cosine")
    ap.add_argument("--probe-batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import device_recall_probe
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.parallel.mesh import replicated, row_sharding, vec_sharding

    cfg = CollectionConfig(name="recall", dim=args.dim, metric=args.metric,
                           dtype=args.dtype, segment_rows=65536, shards=1)
    eng = DeviceEngine(cfg)
    eng.ensure_capacity(args.rows)
    xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

    from vrod_tpu.ops import distances as D

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("start", "rows_n"),
                       out_shardings=(xs, vs, vs))
    def fill(x, aux, valid, *, start, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, args.dim),
                                   dtype=jnp.float32)
        rows, aux_v = D.prepare_rows(rows_f, metric=args.metric,
                                     dtype=x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, rows, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, aux_v, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    chunk = 1 << 20
    for start in range(0, args.rows, chunk):
        eng.x, eng.aux, eng.valid = fill(
            eng.x, eng.aux, eng.valid, start=start,
            rows_n=min(chunk, args.rows - start))
    eng.rebuild_norms()  # direct fill bypasses write(); int8+l2 needs this
    jax.block_until_ready(eng.x)

    rng = np.random.default_rng(123)
    from vrod_tpu.parallel.mesh import replicated as _repl
    q = jax.device_put(
        rng.standard_normal((args.probe_batch, args.dim)).astype(np.float32),
        _repl(eng.mesh))
    _ = np.asarray(jnp.sum(q))  # first readback out of the way

    for k in (10, 16, 100):
        margins = (0, 4, 8, 16, 32, 64)
        if args.dtype == "int8":
            margins = (8, 32, 64, 128, 192, 256)
        for margin in margins:
            recall = device_recall_probe(eng, q, k, margin=margin)
            rec = {"dtype": args.dtype, "metric": args.metric,
                   "rows": args.rows, "k": k, "margin_cfg": margin,
                   "recall": recall}
            with open(RESULTS, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
