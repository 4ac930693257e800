"""Config-5 (8-chip) QPS projection from measured single-chip constants.

Real multi-chip hardware is unavailable in this environment (one v5e chip
through a tunnel; the 8-device mesh is CPU-virtual and anti-scales from
host core contention), so BASELINE config 5's "near-linear to 8 chips"
claim is backed by (a) the dryrun + shard_map correctness leg and (b) THIS
model — a projection, clearly labeled as such, auditable the day real
chips exist.

Model
-----
Per-chip batch latency for a row-sharded search:

    t(N) = t_fixed + t_row * rows / N + t_merge(N) + t_final(N)

- ``t_fixed`` + ``t_row``: affine fit of MEASURED single-chip int8
  batch-256 top-16 latencies (docs/performance.md headline table, all
  recall 1.0 on device; r5 re-captures with the GATED extraction kernel —
  the pre-gating 8.4M point (22.4 ms) is excluded because it measured a
  different kernel):
      1.0 M rows -> 3.994 ms    (64.1k QPS, r5 capture)
     10.0 M rows -> 25.6  ms    (10.0k QPS, r5 capture)
  The two-point fit gives t_fixed ~= 1.59 ms and t_row ~= 2.40 ms per
  million rows. vs the r4 fit (2.34 + 2.36/Mrow): gating cut the FIXED
  term ~0.75 ms (fewer Mosaic while entries — row-count-invariant, as
  predicted by the kernel A/B) and left the stream slope unchanged within
  noise (the int8 HBM scan at ~320 GB/s effective). Consistency check:
  the excluded 8.4M pre-gating point sits +0.64 ms above this fit —
  about the per-block gating saving at that row count.
  Sharding divides only the t_row term: every shard still pays the fixed
  cost, runs the same k_scan extraction, and rescores its own candidates.

- ``t_merge(N)``: ring all-gather of each shard's (vals f32, idx i32)
  top-k_scan block — shards x k_scan x 8 B per query (engine.py
  merge_shards). Ring all-gather of S bytes per chip over N chips costs
  (N-1) x (S / bw_link + hop_lat). ICI constants are the public v5e
  numbers (jax-ml.github.io/scaling-book: ~4.5e10 B/s one-way per link,
  ~1 us per hop); the conclusion is insensitive to 2x error here — the
  merge is microseconds against a multi-millisecond scan.

- ``t_final(N)``: the replicated lax.top_k over N x k_scan candidates per
  query after the gather — modeled at 0.1 ms per 256-query batch at N=8
  (a 256 x 192 top-k; generous).

What the model says (and performance.md records): at 10M x 768 int8
batch 256, 8 chips project to ~4.7 ms/batch (~54k QPS) vs 25.6 ms
measured on one chip — a 5.4x speedup, 68% parallel efficiency (the
gated kernel's smaller fixed cost IMPROVED sharding efficiency: the
term every shard repays shrank). Near-linear (>90%) row-sharded scaling
needs rows/chip >= ~6M (t_row term >= 9x fixed), i.e. config 5's own
10M rows are near-linear on 1-2 chips and fixed-cost-bound at 8. For
collections that FIT one chip, scale-out is REPLICATION
(vrod_tpu/replication.py): N replicas serve N independent query
streams — linear by construction, no merge term at all.
"""

from __future__ import annotations

import numpy as np

# Measured single-chip points (rows in millions, batch-256 latency in ms).
# r5 captures (gated-extraction kernel, docs/performance.md). The 8.4M
# pre-gating point (22.4 ms) is excluded: different kernel.
MEASURED = [(1.0, 3.994), (10.0, 25.6)]

# Packed int4 tier, same kernel family (two half-dim s8xs8 dots): the
# THREE r5 hardware points incl. the 20M capacity capture int8 cannot
# reach (7.8 GB resident; int8 would need 15.4 GB). Slope ~2.2 ms/Mrow —
# a wash vs int8 within the session noise band, as the 1M/10M A/Bs
# showed (the scan is MXU+VPU-serialization-bound, not DMA-bound, so
# halving the stream does not change the slope).
MEASURED_INT4 = [(1.0, 3.940), (10.0, 24.61), (20.97152, 46.17)]

BATCH = 256
K_SCAN = 24          # top-16 scans k + margin-8 candidates
BYTES_PER_CAND = 8   # f32 score + i32 index
ICI_BW = 4.5e10      # B/s one-way per link (public v5e, scaling-book)
HOP_LAT = 1e-6       # s per ICI hop
T_FINAL_8 = 0.1e-3   # s, replicated 256 x (8 x 24) lax.top_k at N=8


def fit_affine(points=None):
    points = MEASURED if points is None else points
    a = np.array([[1.0, r] for r, _ in points])
    b = np.array([t for _, t in points])
    (fixed, slope), *_ = np.linalg.lstsq(a, b, rcond=None)
    return float(fixed), float(slope)  # ms, ms per M rows


def project(rows_m: float, shards: int, fixed: float, slope: float,
            batch: int = BATCH, k_scan: int = K_SCAN) -> float:
    """Batch latency in ms for rows_m million rows over `shards` chips."""
    scan = fixed + slope * rows_m / shards
    if shards == 1:
        return scan
    per_chip = batch * k_scan * BYTES_PER_CAND  # S bytes contributed
    merge = (shards - 1) * (per_chip / ICI_BW + HOP_LAT) * 1e3  # ms
    final = T_FINAL_8 * 1e3 * (shards / 8)
    return scan + merge + final


def main():
    fixed, slope = fit_affine()
    print(f"affine fit: t = {fixed:.2f} ms + {slope:.3f} ms/Mrow "
          f"(residuals: "
          + ", ".join(f"{t - (fixed + slope * r):+.2f}" for r, t in MEASURED)
          + " ms)")
    fixed4, slope4 = fit_affine(MEASURED_INT4)
    print(f"int4 affine fit: t = {fixed4:.2f} ms + {slope4:.3f} ms/Mrow "
          f"(residuals: "
          + ", ".join(f"{t - (fixed4 + slope4 * r):+.2f}"
                      for r, t in MEASURED_INT4)
          + " ms)")
    for rows_m, label, fx, sl in (
            (10.0, "config 5: 10M x 768 int8 top-16", fixed, slope),
            (1.0, "north star: 1M x 768 int8 top-16", fixed, slope),
            (80.0, "capacity case: 80M x 768 int8", fixed, slope),
            (160.0, "capacity case: 160M x 768 packed int4 "
                    "(20M rows/chip at 8 — int8 cannot fit)",
             fixed4, slope4)):
        print(f"\n{label} (batch {BATCH}):")
        print(f"{'shards':>7} {'ms/batch':>9} {'QPS':>8} {'speedup':>8} "
              f"{'efficiency':>10}")
        t1 = project(rows_m, 1, fx, sl)
        for n in (1, 2, 4, 8):
            t = project(rows_m, n, fx, sl)
            qps = BATCH / t * 1e3
            print(f"{n:>7} {t:>9.2f} {qps:>8.0f} {t1 / t:>7.2f}x "
                  f"{t1 / t / n:>9.0%}")


if __name__ == "__main__":
    main()
