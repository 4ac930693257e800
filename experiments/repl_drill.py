"""10M-scale replication drill (VERDICT r3 item 8): end-to-end timed
exercise of the durability + replication stack at config-5 volume on the
CPU backend.

Phases (all wall-clock timed, JSON summary at the end):

  A. ingest   — bulk-insert ROWS x DIM int8 rows into a fresh primary
                (library path, chunked; ~7.4 GB device bytes at 10M x 768)
  B. snapshot — non-blocking streaming snapshot + WAL truncation
  C. bootstrap— launch `vrod --serve` primary + `--replica-of` replica as
                OS processes; time snapshot-ship bootstrap to caught-up
  D. kill/resume — push a mutation tail through the serving path, SIGKILL
                the replica MID-TAIL, restart it, time resume-to-caught-up
                and assert it resumed WITHOUT re-bootstrapping (its WAL is
                the primary's byte-identical suffix)
  E. verify   — counts match; spot records bit-identical across the pair

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu VROD_PLATFORM=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=1 \
      python experiments/repl_drill.py [--rows 10000000] [--workdir DIR]

Notes for reading the numbers: this host has ONE CPU core — ingest,
serving, and replica apply all contend for it, so wall times are an upper
bound everywhere; the phase the drill actually gates on (bootstrap ship +
tail resume) is disk/IPC-bound and representative. Host memory stays
bounded by construction (chunked bulk frames, streamed snapshot writer,
4 MB RPC fetch chunks, disk payload store not needed since payloads are
empty). Results are recorded in docs/performance.md.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import signal
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ENV = dict(os.environ)
ENV.update({"PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu",
            "VROD_PLATFORM": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1"})


def vm_hwm_mb(pid: int) -> float:
    try:
        for line in open(f"/proc/{pid}/status"):
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1024
    except OSError:
        pass
    return -1.0


def wait_socket(path: Path, timeout: float = 300) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if path.is_socket():
            return
        time.sleep(0.25)
    raise TimeoutError(f"Server socket {path} never appeared")


def wait_caught_up(rc, names, timeout: float = 3600) -> float:
    """Poll replica STATS until every collection in `names` reports lag 0."""
    t0 = time.time()
    deadline = t0 + timeout
    while time.time() < deadline:
        st = rc.stats().get("replication", {})
        lag = st.get("lag", {})
        if (set(lag) >= set(names)
                and all(lag[n] <= 0 for n in names)
                and st.get("last_error") is None):
            return time.time() - t0
        time.sleep(0.5)
    raise TimeoutError(f"Replica never caught up: {rc.stats()}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--tail-rows", type=int, default=100_000)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from vrod_tpu.client import VrodClient
    from vrod_tpu.database import Database

    work = Path(args.workdir or tempfile.mkdtemp(prefix="repl_drill_"))
    work.mkdir(parents=True, exist_ok=True)
    times: dict[str, float] = {}
    summary: dict = {"rows": args.rows, "dim": args.dim,
                     "bytes_int8": args.rows * args.dim}
    rng = np.random.default_rng(0)

    # -- A: ingest ---------------------------------------------------------
    db = Database.new(work, "pdb")
    col = db.create_collection("big", dim=args.dim, dtype="int8",
                               metric="cosine", segment_rows=1_048_576)
    t0 = time.time()
    done = 0
    while done < args.rows:
        n = min(args.chunk, args.rows - done)
        vecs = rng.random((n, args.dim), dtype=np.float32) - 0.5
        col.bulk_insert(vecs)
        done += n
        el = time.time() - t0
        print(f"[ingest] {done / 1e6:.1f}M rows in {el:.0f}s "
              f"({done * args.dim / el / 1e6:.0f} MB/s int8-equiv)",
              flush=True)
    times["ingest_s"] = time.time() - t0

    # -- B: snapshot (the bytes the bootstrap will ship) --------------------
    t0 = time.time()
    col.snapshot()
    times["snapshot_s"] = time.time() - t0
    snap_bytes = sum(f.stat().st_size
                     for f in (col.path / "snapshot").iterdir())
    summary["snapshot_bytes"] = snap_bytes
    print(f"[snapshot] {snap_bytes / 1e9:.2f} GB in "
          f"{times['snapshot_s']:.0f}s "
          f"({snap_bytes / times['snapshot_s'] / 1e6:.0f} MB/s)", flush=True)
    db.close()
    summary["ingest_rss_mb"] = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / 1024

    # -- C: bootstrap ship over the serving protocol ------------------------
    p_sock, r_sock = work / "p.sock", work / "r.sock"
    primary = subprocess.Popen(
        [sys.executable, "-m", "vrod_tpu.cli", "-d", str(work / "pdb"),
         "--serve", f"unix:{p_sock}"], env=ENV,
        stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    replica = None

    def spawn_replica():
        return subprocess.Popen(
            [sys.executable, "-m", "vrod_tpu.cli", "-d", str(work / "rdb"),
             "--serve", f"unix:{r_sock}", "--replica-of", f"unix:{p_sock}"],
            env=ENV, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)

    try:
        wait_socket(p_sock)
        subprocess.run([sys.executable, "-m", "vrod_tpu.cli",
                        "--init-database", str(work), "-n", "rdb"],
                       env=ENV, check=True, capture_output=True)
        t0 = time.time()
        replica = spawn_replica()
        wait_socket(r_sock)
        with VrodClient(f"unix:{r_sock}") as rc:
            times["bootstrap_s"] = wait_caught_up(rc, ["big"])
            boot_stats = rc.stats()
        assert boot_stats["counters"].get("repl.bootstraps", 0) == 1
        print(f"[bootstrap] caught up in {times['bootstrap_s']:.0f}s "
              f"({snap_bytes / times['bootstrap_s'] / 1e6:.0f} MB/s "
              f"end-to-end)", flush=True)
        summary["replica_rss_mb"] = vm_hwm_mb(replica.pid)

        # -- D: mutation tail, SIGKILL mid-tail, resume ---------------------
        tail_chunks = []
        with VrodClient(f"unix:{p_sock}", timeout=600) as pc:
            t0 = time.time()
            for i in range(0, args.tail_rows, 10_000):
                n = min(10_000, args.tail_rows - i)
                vecs = rng.random((n, args.dim), dtype=np.float32) - 0.5
                tail_chunks.append(
                    pc.bulk_insert("big", vecs,
                                   [f"t{i + j}" for j in range(n)]))
            times["tail_ack_s"] = time.time() - t0
            primary_pos = pc.position("big")
        # Give the tail a moment to START flowing, then kill mid-apply.
        time.sleep(2.0)
        replica.kill()
        replica.wait(timeout=60)
        # The SIGKILL leaves a stale socket file; the new server reclaims
        # it, but wait_socket would match the STALE file — remove it so
        # the wait below observes the new bind.
        r_sock.unlink(missing_ok=True)
        print(f"[kill] replica SIGKILLed mid-tail "
              f"(primary position {primary_pos})", flush=True)

        t0 = time.time()
        replica = spawn_replica()
        wait_socket(r_sock)
        with VrodClient(f"unix:{r_sock}") as rc:
            times["resume_s"] = wait_caught_up(rc, ["big"])
            resume_stats = rc.stats()
        # Resumed by TAILING ONLY — a resync/bootstrap in the new process
        # would mean the durable-suffix contract broke.
        assert resume_stats["counters"].get("repl.bootstraps", 0) == 0, \
            resume_stats["counters"]
        assert resume_stats["counters"].get("repl.resyncs", 0) == 0
        print(f"[resume] caught up in {times['resume_s']:.0f}s without "
              f"re-bootstrap", flush=True)

        # -- E: verify -------------------------------------------------------
        with VrodClient(f"unix:{p_sock}", timeout=600) as pc, \
                VrodClient(f"unix:{r_sock}", timeout=600) as rc:
            some = [int(tail_chunks[0][0]), int(tail_chunks[-1][-1]), 1,
                    args.rows // 2]
            for rid in some:
                pv, pp = pc.get("big", rid)
                rv, rp = rc.get("big", rid)
                assert pp == rp and np.array_equal(pv, rv), f"record {rid}"
        summary["verified_records"] = len(some)
        summary["primary_rss_mb"] = vm_hwm_mb(primary.pid)
        summary["replica_rss_mb"] = max(summary.get("replica_rss_mb", 0),
                                        vm_hwm_mb(replica.pid))
    finally:
        for proc in (replica, primary):
            if proc is not None:
                proc.send_signal(signal.SIGINT)
        for proc in (replica, primary):
            if proc is not None:
                try:
                    proc.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait(timeout=60)

    summary["times"] = {k: round(v, 1) for k, v in times.items()}
    print(json.dumps(summary))
    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
