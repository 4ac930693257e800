"""kexp16: sampled-floor pre-pass block-size A/B at top-100 (int8).

The floor's threshold step (approx_max_k over the sub-maxima) costs
~0.85 ms at blk 8192 (nsub 2048 at 1M rows); doubling the block halves
nsub (cheaper threshold) but widens the strided groups (looser floor ->
more extraction). Soundness is grouping-invariant, so this is purely a
perf trade. Measures blk in (8192, 16384, 32768) in ONE process.

Usage: python experiments/kexp16.py [--rows 1048576] [--metric cosine]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--metric", default="cosine")
    ap.add_argument("--dtype", default="int8")
    args = ap.parse_args()

    import jax
    from experiments.kexp15 import build, timed_qps
    from vrod_tpu.parallel.mesh import replicated

    eng = build(args.metric, args.rows, args.dim, dtype=args.dtype)
    rng = np.random.default_rng(42)
    q = jax.device_put(
        rng.standard_normal((args.batch, args.dim)).astype(np.float32),
        replicated(eng.mesh))
    jax.block_until_ready(q)

    out = []
    # "0" = auto block selection (the engine default since this A/B
    # landed); repeat 8192 = drift control bracket.
    for blk in ("8192", "16384", "32768", "0", "8192"):
        os.environ["VROD_THETA0_BLK"] = blk
        qps = timed_qps(eng, q, args.k)
        ve, _ = eng.search(q[:8], args.k)
        vo, _ = eng.search(q[:8], args.k, impl="scan", precision="exact",
                           rescore=False)
        lower = args.metric == "l2"
        kth = vo[:, args.k - 1:args.k]
        scale = np.maximum(np.abs(kth), 1.0)
        rec = float(((ve <= kth + 1e-5 * scale) if lower
                     else (ve >= kth - 1e-5 * scale)).mean())
        print(f"blk={blk}: {qps:,.0f} QPS recall={rec:.4f}", flush=True)
        out.append({"exp": "kexp16", "metric": args.metric, "k": args.k,
                    "dtype": args.dtype, "blk": int(blk),
                    "qps": round(qps, 1), "recall": rec,
                    "rows": args.rows, "dim": args.dim,
                    "batch": args.batch})
    os.environ["VROD_THETA0_BLK"] = "0"  # back to the shipped auto default
    with open(Path(__file__).parent / "kexp_results.jsonl", "a") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
