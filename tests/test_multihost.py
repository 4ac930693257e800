"""Multi-host (DCN analogue) test: the SAME shard_map search program runs
across two OS processes whose CPU devices form one global mesh — the
multiprocess stand-in for a multi-host TPU pod (SURVEY §5 "DCN for
multi-host pods"). Each process row-shards the collection over all 8
global devices (4 local + 4 remote), searches, and checks exactness."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["VROD_PLATFORM"] = "cpu"
    os.environ["VROD_COORDINATOR"] = f"localhost:{port}"
    os.environ["VROD_NUM_PROCESSES"] = "2"
    os.environ["VROD_PROCESS_ID"] = str(pid)

    import numpy as np
    from vrod_tpu.parallel import distributed
    distributed.initialize()

    import jax
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()

    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine

    cfg = CollectionConfig(name="mh", dim=64, metric="cosine",
                           segment_rows=64, shards=8)
    eng = DeviceEngine(cfg, devices=distributed.global_devices())
    assert eng.shards == 8

    rng = np.random.default_rng(7)  # same data in both processes (SPMD)
    n = 512
    vecs = rng.standard_normal((n, cfg.dim)).astype(np.float32)
    eng.ensure_capacity(n)
    eng.write(np.arange(n, dtype=np.uint64), vecs)
    eng.erase(np.arange(0, n, 7))

    q = vecs[8:12]
    vals, idx = eng.search(q, k=5)
    assert idx.shape == (4, 5)
    assert (idx % 7 != 0).all(), "deleted rows leaked"
    for i, qi in enumerate(range(8, 12)):
        assert idx[i, 0] == qi, (pid, i, idx[i])
        assert abs(vals[i, 0] - 1.0) < 1e-4
    print(f"RANK{pid}_OK", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_search(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items() if "axon" not in v.lower()
           or k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = str(REPO)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"RANK{i}_OK" in out
