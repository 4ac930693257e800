"""theta0 warm-start decomposition: cost of the sampled pre-pass vs the
extraction time it saves at large k_scan.

  python experiments/kexp7.py --kscan 112
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kscan", type=int, default=112)
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from experiments.kexp import fill_device
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops.pallas_topk import fused_topk

    x, aux2d, mask2d = fill_device(args.rows, 768, args.dtype)
    dim = x.shape[1]
    aux = aux2d.reshape(-1)
    valid = jnp.ones((args.rows,), bool)
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((args.batch, dim)), dtype=jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    jax.block_until_ready(x)
    _ = np.asarray(jnp.sum(q))

    def make_thr(**kw):
        return jax.jit(functools.partial(
            D.sampled_threshold, k=args.kscan, metric="cosine",
            precision=lax.Precision.DEFAULT, **kw))

    thr = make_thr()

    def timeit(fn, *a, reps=None):
        reps = reps or args.iters
        r = fn(*a)
        for _ in range(5):
            r = fn(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps * 1e3

    ms_thr = timeit(thr, x, aux, valid, q)
    t0 = thr(x, aux, valid, q)

    kern = functools.partial(fused_topk, k=args.kscan, metric="cosine",
                             precision_name="fast")
    cold = jax.jit(lambda x, aux, valid, q: kern(x, aux, valid, q))
    warm = jax.jit(
        lambda x, aux, valid, q, t0: kern(x, aux, valid, q, theta0=t0))
    fused = jax.jit(lambda x, aux, valid, q: kern(
        x, aux, valid, q,
        theta0=D.sampled_threshold(x, aux, valid, q, k=args.kscan,
                                   metric="cosine",
                                   precision=lax.Precision.DEFAULT)))
    ms_cold = timeit(cold, x, aux, valid, q)
    ms_warm = timeit(warm, x, aux, valid, q, t0)
    ms_fused = timeit(fused, x, aux, valid, q)
    # threshold-variant sweep: single-jit (threshold + warm kernel) totals
    # — per-piece timings through the tunnel carry ~1 ms dispatch noise.
    ic_ref = np.asarray(cold(x, aux, valid, q)[1])
    variants = {}
    from vrod_tpu.ops.pallas_topk import sampled_submax
    n_sample = (min(args.rows, max(128 * args.kscan * 2,
                                   args.rows // 8)) // 2048) * 2048

    def make_pallas_fused(coarsen):
        def pallas_fused(x, aux, valid, q):
            sub = sampled_submax(
                x[:n_sample], aux[:n_sample], valid[:n_sample], q,
                metric="cosine", precision_name="fast")
            if coarsen > 1:
                b = sub.shape[0]
                sub = jnp.max(
                    sub.reshape(b, sub.shape[1] // coarsen, coarsen), axis=2)
            return kern(x, aux, valid, q,
                        theta0=D.threshold_from_submax(sub, args.kscan))
        return jax.jit(pallas_fused)

    def make_pallas_amk(recall_target=0.95):
        def pallas_amk(x, aux, valid, q):
            sub = sampled_submax(
                x[:n_sample], aux[:n_sample], valid[:n_sample], q,
                metric="cosine", precision_name="fast")
            vals, _ = lax.approx_max_k(sub, args.kscan,
                                       recall_target=recall_target)
            kth = vals[:, args.kscan - 1:args.kscan]
            t0 = kth - (jnp.abs(kth) * 2e-3 + 1e-20)
            t0 = jnp.where(jnp.isfinite(t0), t0, -jnp.inf)
            return kern(x, aux, valid, q, theta0=t0)
        return jax.jit(pallas_amk)

    for name, fn in [
        ("pallas_c1", make_pallas_fused(1)),
        ("pallas_c4", make_pallas_fused(4)),
        ("pallas_c8", make_pallas_fused(8)),
        ("pallas_amk95", make_pallas_amk(0.95)),
        ("pallas_amk80", make_pallas_amk(0.80)),
    ]:
        pf = fn
        ms_pf = timeit(pf, x, aux, valid, q)
        _, ipf = pf(x, aux, valid, q)
        variants[name] = {
            "total_ms": round(ms_pf, 3),
            "matches": bool((np.asarray(ipf) == ic_ref).all())}
    for name, kw in [
        ("sub8_f8", {"sub_rows": 8}),
        ("sub16_f8", {"sub_rows": 16}),
        ("sub32_f8", {"sub_rows": 32}),
        ("sub32_f4", {"sub_rows": 32, "max_fraction": 4}),
        ("sub16_f4", {"sub_rows": 16, "max_fraction": 4}),
    ]:
        fv = jax.jit(lambda x, aux, valid, q, kw=kw: kern(
            x, aux, valid, q,
            theta0=D.sampled_threshold(x, aux, valid, q, k=args.kscan,
                                       metric="cosine",
                                       precision=lax.Precision.DEFAULT,
                                       **kw)))
        ms_total = timeit(fv, x, aux, valid, q)
        _, iv = fv(x, aux, valid, q)
        variants[name] = {
            "total_ms": round(ms_total, 3),
            "matches": bool((np.asarray(iv) == ic_ref).all())}
    # correctness
    vc, ic = cold(x, aux, valid, q)
    vw, iw = warm(x, aux, valid, q, t0)
    match = bool((np.asarray(ic) == np.asarray(iw)).all())

    rec = {"variant": "theta0_decomp", "rows": args.rows, "batch": args.batch,
           "k_scan": args.kscan, "dtype": args.dtype,
           "ms_threshold_pass": round(ms_thr, 3),
           "ms_kernel_cold": round(ms_cold, 3),
           "ms_kernel_warm": round(ms_warm, 3),
           "ms_fused_total": round(ms_fused, 3),
           "variants": variants,
           "warm_matches_cold": match, "tag": "theta0"}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
