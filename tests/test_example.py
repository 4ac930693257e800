"""The quickstart example must keep working (it is documentation)."""

import runpy
import sys
from pathlib import Path


def test_quickstart_runs(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    example = (Path(__file__).resolve().parent.parent
               / "examples" / "quickstart.py")
    runpy.run_path(str(example), run_name="__main__")
    out = capsys.readouterr().out
    assert "Inserted 18 records" in out
    assert "recall check: 1.0" in out


def test_serving_example_runs(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("VROD_EXAMPLE_SECONDS", "1.0")
    example = (Path(__file__).resolve().parent.parent
               / "examples" / "serving.py")
    runpy.run_path(str(example), run_name="__main__")
    out = capsys.readouterr().out
    assert "served" in out and "packed batches" in out
