"""Multi-host collective-path fuzz: random op mixes (mutations, searches,
snapshot / reindex / truncate_wal, close+collective-reload) on a
two-OS-process global mesh, model-checked on BOTH ranks.

Why: the multiprocess collective path (SPMD mutations with rank-0 WAL
ownership; round-4 collective maintenance where every rank gathers and
writes its own snapshot at the leader's LSN cut) is the least-fuzzed
subsystem — tests/test_multihost.py drives fixed scripts. The round-3
replication fuzz found a real LSN bug precisely by mixing maintenance
ops into random mutation streams; this harness applies the same recipe
to the DCN analogue.

Each seed spawns two ranks (4 virtual CPU devices each → one 8-device
global mesh). Both ranks run the IDENTICAL seeded op stream (the SPMD
contract) against a host model dict; every ~8 ops and at the end, exact
search results and counts are checked against the model on both ranks,
and a final collective reload must reproduce the model bit-for-bit.

Usage: python experiments/fuzz_multihost.py <lo> <hi>
(seeds lo..hi-1; ~15-25 s per seed — two jax inits per seed dominate).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile
import textwrap
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    workdir = sys.argv[3]; seed = int(sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["VROD_PLATFORM"] = "cpu"
    os.environ["VROD_COORDINATOR"] = f"localhost:{port}"
    os.environ["VROD_NUM_PROCESSES"] = "2"
    os.environ["VROD_PROCESS_ID"] = str(pid)

    import numpy as np
    from vrod_tpu.parallel import distributed
    distributed.initialize()

    from pathlib import Path
    from vrod_tpu.collection import Collection
    from vrod_tpu.config import CollectionConfig

    DIM = 16
    cfg = CollectionConfig(name="mh", dim=DIM, metric="cosine",
                           segment_rows=64, shards=8)
    path = Path(workdir) / f"rank{pid}" / "mh"
    col = Collection.create(path, cfg,
                            devices=distributed.global_devices())
    assert col.engine.multiprocess

    rng = np.random.default_rng(seed)  # IDENTICAL stream on both ranks
    model = {}  # rid -> (vector, payload)

    def vec():
        return rng.standard_normal(DIM).astype(np.float32)

    def check():
        assert col.count == len(model), (pid, col.count, len(model))
        if not model:
            return
        keys = np.array(sorted(model))
        mat = np.stack([model[int(k)][0] for k in keys])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        q = vec()  # consumed identically on both ranks
        qn = q / np.linalg.norm(q)
        want = keys[np.argsort(-(mat @ qn), kind="stable")[:5]]
        hits = col.search_similar(q, k=5)  # 1-D query -> list[Hit]
        got = [h.record_id for h in hits]
        assert got == [int(w) for w in want], (pid, got, list(want))
        # payload spot check on the top hit
        assert hits[0].payload == model[got[0]][1]

    n_ops = 60
    wal_base = 0  # follower WAL frames (nonzero only after adopting the
    #               leader's dir; mutations never append on the follower)
    for step in range(n_ops):
        roll = float(rng.random())
        live = sorted(model)
        if roll < 0.30 or not live:
            k = int(rng.integers(1, 24))
            vs = rng.standard_normal((k, DIM)).astype(np.float32)
            rids = col.bulk_insert(vs, [f"s{step}-{i}" for i in range(k)])
            for i, r in enumerate(rids):
                model[int(r)] = (vs[i], f"s{step}-{i}")
        elif roll < 0.45:
            v = vec()
            rid = col.insert(v, f"one{step}")
            model[int(rid)] = (v, f"one{step}")
        elif roll < 0.60:
            k = min(len(live), int(rng.integers(1, 16)))
            victims = [int(live[int(i)]) for i in
                       rng.choice(len(live), size=k, replace=False)]
            col.delete_many(victims)
            for r in victims:
                model.pop(r, None)
        elif roll < 0.70:
            t = int(live[int(rng.integers(0, len(live)))])
            v = vec()
            col.update(t, v, f"u{step}")
            model[t] = (v, f"u{step}")
        elif roll < 0.80:
            col.snapshot()
            wal_base = 0  # snapshot cuts + truncates on EVERY rank
        elif roll < 0.88:
            col.reindex()
            wal_base = 0
        elif roll < 0.94:
            col.truncate_wal()
            wal_base = 0
        else:
            # Collective close + reload in place. Contract: in-place
            # reload needs byte-identical rank state. Rank 0 owns WAL
            # durability, so mid-WAL rank dirs NEVER match — load must
            # REFUSE them (exercised below), after which the follower
            # adopts the leader's bytes (same host in this harness —
            # the documented recovery recipe) and the collective load
            # must accept the now-identical mid-WAL state.
            # Both ranks agree on accept-vs-refuse without coordination:
            # the fingerprint check is itself a collective all-gather,
            # so either every rank raises or every rank loads.
            col.close()
            leader = Path(workdir) / "rank0" / "mh"
            try:
                col = Collection.load(path,
                                      devices=distributed.global_devices())
                accepted = True
            except RuntimeError as e:
                assert "byte-identical" in str(e), e
                accepted = False
            if not accepted:
                # diverged mid-WAL: follower adopts the leader's dir,
                # then the collective load must succeed with identical
                # NON-empty WALs on both ranks.
                import shutil as _sh
                import time as _t
                if pid == 1:
                    _sh.rmtree(path)
                    _sh.copytree(leader, path)
                marker = Path(workdir) / f"copied{step}.{pid}"
                marker.touch()
                other = Path(workdir) / f"copied{step}.{1 - pid}"
                for _ in range(1200):
                    if other.exists():
                        break
                    _t.sleep(0.05)
                else:
                    raise SystemExit(f"rank {pid}: copy barrier timeout")
                col = Collection.load(path,
                                      devices=distributed.global_devices())
            assert col.engine.multiprocess
            wal_base = col.wal.frame_count if pid == 1 else wal_base
        if step % 8 == 7:
            check()
        # Leader owns WAL durability: mutations never append on the
        # follower (its frames only change via adoption/maintenance).
        if pid == 1:
            assert col.wal.frame_count == wal_base, \\
                (step, col.wal.frame_count, wal_base)

    check()
    col.snapshot()  # restore rank-dir identity for the in-place reload
    col.close()
    col = Collection.load(path, devices=distributed.global_devices())
    assert col.count == len(model)
    # Full-model spot verification after the final reload.
    for rid in sorted(model)[:50]:
        rec = col.get(rid)
        np.testing.assert_allclose(np.asarray(rec.vector, np.float32),
                                   model[rid][0], rtol=2e-2, atol=2e-2)
        assert rec.payload == model[rid][1]
    check()
    print(f"RANK{pid}_OK", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_seed(seed: int) -> None:
    tmp = Path(tempfile.mkdtemp(prefix=f"mhfuzz{seed}_"))
    script = tmp / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if "axon" not in v.lower()
           or k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = str(REPO)
    env.pop("JAX_PLATFORMS", None)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port), str(tmp),
         str(seed)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 or f"RANK{i}_OK" not in out:
            raise AssertionError(
                f"seed {seed} rank {i} failed (rc={p.returncode}):\n"
                f"{out[-4000:]}")
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else lo + 10
    t0 = time.time()
    for seed in range(lo, hi):
        s = time.time()
        run_seed(seed)
        print(f"seed {seed} OK ({time.time()-s:.1f}s)", flush=True)
    print(f"ALL {hi - lo} SEEDS PASSED in {time.time()-t0:.0f}s",
          flush=True)
