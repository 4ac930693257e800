"""Observability: structured query log, counters, profiling hooks.

The reference's only diagnostics are stdout prints in the ingest path
(``/root/reference/src/utils/embeddings.rs:34-49``). Here (SURVEY §5):
structured per-query JSON-lines logging (latency, k, metric, batch, shard
fan-out), framework-wide counters for mutations/compaction/WAL traffic, and
``jax.profiler`` trace hooks for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict
from pathlib import Path


class Counters:
    """Process-wide monotonic counters (thread-safe)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counts: dict[str, int] = defaultdict(int)

    def inc(self, name: str, n: int = 1) -> None:
        with self._lock:
            self._counts[name] += n

    def get(self, name: str) -> int:
        with self._lock:
            return self._counts[name]

    def snapshot(self) -> dict[str, int]:
        with self._lock:
            return dict(self._counts)

    def reset(self) -> None:
        with self._lock:
            self._counts.clear()


counters = Counters()


class QueryLog:
    """JSON-lines structured log. A sink is a file path or a callable."""

    def __init__(self, sink=None):
        self._lock = threading.Lock()
        self._file = None
        self._cb = None
        self.configure(sink)

    def configure(self, sink) -> None:
        with self._lock:
            if self._file:
                self._file.close()
                self._file = None
            self._cb = None
            if sink is None:
                return
            if callable(sink):
                self._cb = sink
            else:
                self._file = open(Path(sink), "a")

    def emit(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        try:
            with self._lock:
                if self._cb is not None:
                    self._cb(rec)
                elif self._file is not None:
                    self._file.write(json.dumps(rec) + "\n")
                    self._file.flush()
        except Exception as e:
            # Observability must never fail (or mask) the instrumented
            # path: a full disk or a throwing user callback drops the
            # record with a warning, not the search result.
            import warnings
            warnings.warn(f"query_log sink failed; record dropped: {e!r}")


query_log = QueryLog()


@contextlib.contextmanager
def timed(event: str, **fields):
    """Time a block; emit a query-log record and bump counters."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        counters.inc(event)
        query_log.emit(event, latency_ms=round(dt * 1e3, 3), **fields)


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture a jax profiler trace (TensorBoard/XProf format) for the block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
