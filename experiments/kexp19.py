"""kexp19 (VERDICT r4 item 4, stock-path leg): threshold method A/B —
``approx_max_k`` vs the exact counting k-th statistic
(``distances.kth_largest_count``) feeding the sampled-floor theta0.

Why it might win twice:
- CHEAPER: approx_max_k over the (B, nsub) sub-maxima measured ~0.8 ms
  at nsub 8192 (kexp14); the counting radix-lift is 32 vectorized
  compare+sums over the same array — a few hundred KB of VPU traffic per
  pass, microseconds on paper.
- TIGHTER: approx_max_k at recall_target 0.95 can drop true top
  sub-maxima, so its k-th return sits at or BELOW the true k-th — a
  looser floor means extra extraction passes in the main kernel
  (~0.037 ms per k_scan unit). The count method returns the exact k-th
  sub-max: the tightest floor this pre-pass can justify.

Both are SOUND (tests/test_pallas.py pins count == exact top_k bit-for-
bit and the engine path against the scan oracle); this experiment is
pure perf. Same-process engine-level A/B: VROD_THETA0_METHOD is part of
the program-cache key, so flipping the env re-traces. int8 cosine
(headline dtype), k in (16, 100) — the floor gate is open for both at
1M x 768 via the k_scan >= 24 int8 rule.

Usage: python experiments/kexp19.py [--rows 1048576] [--dim 768]
                                    [--batch 256] [--metric cosine]
Appends one JSON line per point to experiments/kexp_results.jsonl.
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# Same fill harness (int8-capable, rebuilds norms) AND the same
# measurement loop — one copy of the methodology to keep in sync.
from kexp15 import build, timed_qps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--metric", default="cosine")
    ap.add_argument("--dtype", default="int8")
    args = ap.parse_args()

    import jax
    from vrod_tpu.parallel.mesh import replicated
    rng = np.random.default_rng(42)

    eng = build(args.metric, args.rows, args.dim, dtype=args.dtype)
    q = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    if args.metric == "cosine":
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jax.device_put(q, replicated(eng.mesh))
    jax.block_until_ready(q)

    out = []
    for k in (16, 100):
        # A/B/A bracketing within the k: approx, count, approx again —
        # the control re-run exposes tunnel drift inside the comparison.
        for method in ("approx", "count", "approx"):
            os.environ["VROD_THETA0_METHOD"] = method
            qps = timed_qps(eng, q, k)
            # exactness spot check vs the exact scan oracle
            ve, _ = eng.search(q[:8], k)
            vo, _ = eng.search(q[:8], k, impl="scan", precision="exact",
                               rescore=False)
            kth = vo[:, k - 1:k]
            scale = np.maximum(np.abs(kth), 1.0)
            rec = float(((ve <= kth + 1e-5 * scale) if args.metric == "l2"
                         else (ve >= kth - 1e-5 * scale)).mean())
            print(f"{args.metric} k={k} method={method}: {qps:,.0f} QPS "
                  f"recall={rec:.4f}", flush=True)
            out.append({"exp": "kexp19", "metric": args.metric, "k": k,
                        "method": method, "qps": round(qps, 1),
                        "recall": rec, "rows": args.rows,
                        "dim": args.dim, "batch": args.batch,
                        "dtype": args.dtype})
    os.environ["VROD_THETA0_METHOD"] = "approx"
    with open(os.path.join(os.path.dirname(__file__),
                           "kexp_results.jsonl"), "a") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
