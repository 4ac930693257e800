"""The driver entry points must stay green.

``dryrun_multichip`` is the driver's multi-chip correctness gate; round 1
failed it when an eager op escaped onto a version-skewed tunnelled TPU
backend, so this test runs it exactly as the driver does — in-process, with
whatever hostile environment the parent has — and relies on the entry
point's own hermetic subprocess isolation.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_multichip_in_hostile_env():
    # Simulate the production launcher: axon plugin on PYTHONPATH and the
    # TPU platform selected. The entry point must still complete.
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "PYTHONPATH": f"{REPO}",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    code = "import __graft_entry__ as g; g.dryrun_multichip(4); print('OK')"
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "OK" in res.stdout


def test_dryrun_impl_direct():
    # The body itself (what the subprocess runs) on this process's CPU mesh.
    import __graft_entry__ as g
    g._dryrun_impl(4)
