"""Keep the experiments/ fuzz harnesses importable and passing: CI runs a
few seeds of each so the deep campaigns (see each harness's docstring for
the recorded results) can be re-launched any time without rot."""

import runpy
import sys
from pathlib import Path

import pytest

from vrod_tpu._native.build import load_native

EXPERIMENTS = Path(__file__).resolve().parents[1] / "experiments"


def _run(name, lo, hi):
    argv = sys.argv
    sys.argv = [name, str(lo), str(hi)]
    try:
        runpy.run_path(str(EXPERIMENTS / name), run_name="__main__")
    finally:
        sys.argv = argv


def test_wal_corruption_fuzz_smoke():
    if load_native() is None:
        pytest.skip("native WAL unavailable (fallback leg): the harness "
                    "checks native-vs-python parity, meaningless here")
    _run("fuzz_wal.py", 0, 50)


def test_cold_count_fuzz_smoke():
    _run("fuzz_cold_count.py", 0, 2)


def test_replication_fuzz_smoke():
    _run("fuzz_replication.py", 0, 1)


def test_backup_fuzz_smoke():
    _run("fuzz_backup.py", 0, 2)


def test_protocol_fuzz_smoke():
    _run("fuzz_protocol.py", 0, 2)
