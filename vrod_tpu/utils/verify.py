"""Recall verification harness: engine results vs a NumPy brute-force oracle.

SURVEY §5 (metrics/observability): a recall-checking harness against NumPy
brute force, usable as a CI gate or a production canary after bulk loads.
"""

from __future__ import annotations

import numpy as np


def brute_force_oracle(vectors: np.ndarray, queries: np.ndarray, k: int,
                       metric: str) -> np.ndarray:
    """Row indices (into ``vectors``) of the exact top-k, f64 NumPy."""
    v = np.asarray(vectors, dtype=np.float64)
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    if metric == "cosine":
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
        s = -(q @ v.T)
    elif metric == "dot":
        s = -(q @ v.T)
    elif metric == "l2":
        # Quadratic expansion: O(Q*N) memory. The naive (Q, N, D) broadcast
        # would allocate ~61 GB for 10 queries over 1M x 768 f64.
        s = (np.sum(q * q, axis=1, keepdims=True)
             - 2.0 * (q @ v.T) + np.sum(v * v, axis=1)[None, :])
    else:
        raise ValueError(f"Unknown metric {metric!r}")
    kk = min(k, v.shape[0])
    return np.argsort(s, axis=1, kind="stable")[:, :kk]


def verify_recall(collection, queries: np.ndarray, k: int = 10) -> float:
    """recall@k of ``collection.search_similar`` vs the NumPy oracle over the
    collection's live records. Gathers all live vectors to host — intended
    for tests, CI gates and spot checks, not for 10M-row production sets
    (sample those)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    # Capture a consistent (slots, ids, vectors) view under the read lock:
    # concurrent mutations donate device buffers, so an unlocked gather can
    # race a scatter. The search below takes its own read lock (the RW lock
    # is not reader-reentrant), so a mutation BETWEEN the capture and the
    # search can still yield spurious recall < 1.0 — quiesce mutations when
    # using this as a gate.
    with collection._rw.read():
        live_slots = collection.alloc.live_slots()
        if live_slots.size == 0:
            return 1.0
        rids = collection.alloc.ids_of(live_slots)
        vecs = collection.engine.gather(live_slots.astype(np.int64))
    oracle_pos = brute_force_oracle(vecs, queries, k, collection.config.metric)
    oracle_ids = rids[oracle_pos]
    results = collection.search_similar(queries, k)
    if queries.shape[0] == 1 and not isinstance(results[0], list):
        results = [results]
    total, hit = 0, 0
    for b in range(queries.shape[0]):
        got = {h.record_id for h in results[b]}
        want = set(oracle_ids[b].tolist())
        hit += len(got & want)
        total += len(want)
    return hit / total if total else 1.0
