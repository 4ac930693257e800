"""Long-run serving soak: hours of concurrent searches + mutations +
auto-maintenance against one `VrodServer`, watching for leaks and
errors that the (seconds-long) suite stress tests cannot surface —
unbounded RSS growth (leaked futures/masks/snapshots), fd leaks,
lock-ordering stalls, and counter drift.

Runs entirely on the CPU backend (valid off-TPU: the soak targets the
HOST runtime — server threads, batcher, WAL, snapshot/compact workers —
not kernel throughput). Closed-loop search clients + one mutator client
(batch inserts/deletes that cross the auto-snapshot WAL budget and the
auto-compact live fraction repeatedly), RSS sampled every 15 s.

Pass criteria, printed as ONE JSON line and reflected in the exit code:
  errors == 0,
  fd count bounded (final <= start + 16),
  RSS plateau: final <= 1.35x the 2-minute mark (leaks at these op
  rates dwarf 35% over an hour; jit warm-up is inside the first 2 min).

Usage: python experiments/soak_serve.py [--minutes 30] [--clients 4]
       [--dim 64] [--rows 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def fd_count() -> int:
    return len(os.listdir("/proc/self/fd"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--rows", type=int, default=20000)
    args = ap.parse_args()

    from vrod_tpu.client import VrodClient
    from vrod_tpu.database import Database
    from vrod_tpu.server import VrodServer

    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="vrod_soak_"))
    db = Database.new(tmp, "soak")
    # Budgets sized so the mutator crosses them every few minutes:
    # auto-snapshot + auto-compact run MANY times over the soak.
    db.create_collection(
        "c", dim=args.dim, metric="cosine", dtype="int8",
        segment_rows=8192, auto_snapshot_wal_bytes=8 << 20,
        auto_compact_fraction=0.5)
    col = db.collection("c")
    base = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    col.bulk_insert(base, [f"p{i}" for i in range(args.rows)])

    addr = f"unix:{tmp}/soak.sock"
    stop = threading.Event()
    counts = {"searches": 0, "mutations": 0, "errors": 0}
    errors: list[str] = []
    lock = threading.Lock()

    def searcher(i: int) -> None:
        r = np.random.default_rng(100 + i)
        with VrodClient(addr) as c:
            while not stop.is_set():
                try:
                    q = r.standard_normal(args.dim).astype(np.float32)
                    hits = c.search_similar("c", q, k=10)
                    assert hits, "empty result from a non-empty collection"
                    with lock:
                        counts["searches"] += 1
                except Exception as e:  # noqa: BLE001 - soak records all
                    with lock:
                        counts["errors"] += 1
                        errors.append(f"searcher: {type(e).__name__}: {e}")
                    return

    def mutator() -> None:
        r = np.random.default_rng(999)
        inserted: list[int] = []
        with VrodClient(addr) as c:
            while not stop.is_set():
                try:
                    vecs = r.standard_normal((32, args.dim)) \
                        .astype(np.float32)
                    ids = c.bulk_insert("c", vecs)
                    inserted.extend(ids)
                    # STEADY-STATE churn: once warm, delete as many as
                    # each round inserts (oldest first). Live rows must
                    # stay ~flat or the RSS plateau check below would
                    # flag DATA growth as a leak; WAL bytes and slot
                    # churn still cross the auto-snapshot/auto-compact
                    # budgets continuously.
                    if len(inserted) >= 512:
                        victims = inserted[:32]
                        del inserted[:32]
                        c.delete("c", victims)
                    with lock:
                        counts["mutations"] += 1
                except Exception as e:  # noqa: BLE001
                    with lock:
                        counts["errors"] += 1
                        errors.append(f"mutator: {type(e).__name__}: {e}")
                    return
                time.sleep(0.05)

    samples = []
    fd0 = fd_count()
    # NB: __enter__ alone binds but does not serve (the CLI serves on the
    # calling thread via serve_forever) — .start() spawns the serve thread.
    with VrodServer(db, addr).start():
        threads = [threading.Thread(target=searcher, args=(i,), daemon=True)
                   for i in range(args.clients)]
        threads.append(threading.Thread(target=mutator, daemon=True))
        for t in threads:
            t.start()
        t0 = time.time()
        deadline = t0 + args.minutes * 60
        rss_2min = None
        while time.time() < deadline and not stop.is_set():
            time.sleep(15)
            samples.append({"t": round(time.time() - t0),
                            "rss_mb": round(rss_mb(), 1),
                            "fds": fd_count(),
                            **{k: v for k, v in counts.items()}})
            if rss_2min is None and time.time() - t0 >= 120:
                rss_2min = samples[-1]["rss_mb"]
            if counts["errors"]:
                break
            print(json.dumps(samples[-1]), file=sys.stderr, flush=True)
        stop.set()
        for t in threads:
            t.join(timeout=60)
    db.close()

    wall = samples[-1]["t"] if samples else 0
    rss_end = samples[-1]["rss_mb"] if samples else rss_mb()
    rss_peak = max((s["rss_mb"] for s in samples), default=rss_end)
    fd_end = fd_count()
    leak = (rss_2min is not None and rss_end > 1.35 * rss_2min)
    fd_leak = fd_end > fd0 + 16
    ok = counts["errors"] == 0 and not leak and not fd_leak
    print(json.dumps({
        "exp": "soak_serve", "ok": ok, "wall_s": wall,
        "searches": counts["searches"], "mutations": counts["mutations"],
        "qps": round(counts["searches"] / max(wall, 1), 1),
        "errors": counts["errors"], "first_error": errors[0] if errors
        else None,
        "rss_2min_mb": rss_2min, "rss_peak_mb": rss_peak,
        "rss_end_mb": rss_end, "fd_start": fd0, "fd_end": fd_end,
    }), flush=True)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
