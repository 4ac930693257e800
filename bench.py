"""Headline benchmark: exact top-10 cosine kNN over 1M x 768 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = TPU queries/sec/chip (batch 256, recall@10 verified exact vs a
NumPy f32 oracle on a probe subset). vs_baseline = TPU QPS / single-CPU
NumPy brute-force QPS measured on the same workload (the reference's own
search is an unimplemented stub — /root/reference/src/command/types.rs:128 —
so the comparator is the CPU brute-force scan at identical exactness, per
BASELINE.md).

Usage: python bench.py [--quick]
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np


def wait_for_backend(attempts=None, probe_timeout_s=None, backoff_s=None):
    """Block until the JAX backend initializes, with bounded retries.

    The dev TPU tunnel fails in two modes: a raw ``UNAVAILABLE`` error at
    first dispatch, or an indefinite HANG inside the plugin's connect-retry
    loop (round 3 lost its driver capture to the former — BENCH_r03.json is
    an unparseable traceback). An in-process retry cannot survive the hang
    mode, so each probe runs ``jax.devices()`` in a killable subprocess
    with a timeout. Returns None on success, else the last error string.
    """
    attempts = attempts or int(os.environ.get("VROD_PROBE_ATTEMPTS", "5"))
    probe_timeout_s = probe_timeout_s or float(
        os.environ.get("VROD_PROBE_TIMEOUT_S", "45"))
    backoff_s = backoff_s or float(os.environ.get("VROD_PROBE_BACKOFF_S", "15"))
    probe = ("import jax; ds = jax.devices(); "
             "print('VROD_BACKEND_OK', len(ds), ds[0].platform)")
    platform = os.environ.get("VROD_PLATFORM")
    if platform:
        probe = (f"import jax; ds = jax.devices({platform!r}); "
                 "print('VROD_BACKEND_OK', len(ds), ds[0].platform)")
    last_err = "backend probe never ran"
    for attempt in range(attempts):
        if attempt:
            time.sleep(backoff_s)
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=probe_timeout_s)
        except subprocess.TimeoutExpired:
            last_err = (f"backend probe hung >{probe_timeout_s}s "
                        "(tunnel connect-retry loop)")
            continue
        if r.returncode == 0 and "VROD_BACKEND_OK" in r.stdout:
            return None
        tail = (r.stderr or r.stdout).strip().splitlines()
        last_err = tail[-1] if tail else f"probe rc={r.returncode}"
    return f"backend unavailable after {attempts} attempts: {last_err}"


def fail_json(workload, error, code=1):
    """Driver contract on failure: still ONE parseable JSON line."""
    print(json.dumps({
        "metric": f"bench {workload} (failed)", "value": None,
        "unit": "queries/s", "vs_baseline": None, "error": str(error)[:2000],
    }))
    sys.exit(code)


def tpu_qps(n_rows, dim, batch, k, iters, metric="cosine", dtype="float32",
            impl=None, precision=None, shards=1, rescore_margin=None,
            percentiles=False):
    import jax
    import jax.numpy as jnp
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.parallel.mesh import row_sharding, vec_sharding

    # --margin is a TRUE override (engine.search margin=), not
    # cfg.rescore_margin, which the engine floors at k_out//8 (and higher
    # for int8): small sweep values must actually take effect.
    cfg = CollectionConfig(name="bench", dim=dim, metric=metric, dtype=dtype,
                           segment_rows=65536, shards=shards)
    eng = DeviceEngine(cfg)
    if impl:
        eng.impl = impl
    if precision:
        eng.precision = precision
    eng.ensure_capacity(n_rows)

    # Fill device state directly on-device (streaming 3 GB through the host
    # would benchmark the tunnel, not the engine).
    xs, vs = row_sharding(eng.mesh), vec_sharding(eng.mesh)

    # Chunked so peak HBM stays bounded even where buffer donation is
    # unavailable (multi-GB collections on a 16 GB chip).
    fill_chunk = min(n_rows, 1 << 20)

    from vrod_tpu.ops import distances as D

    # `start` stays traced: a static start would recompile the fill per
    # 1M-row chunk on multi-chunk (4.2M/8.4M/10M) collections.
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnames=("rows_n",),
                       out_shardings=(xs, vs, vs))
    def fill(x, aux, valid, start, *, rows_n):
        key = jax.random.PRNGKey(start)
        rows_f = jax.random.normal(key, (rows_n, dim), dtype=jnp.float32)
        rows, aux_v = D.prepare_rows(
            rows_f, metric=metric, dtype="int4" if eng.packed else x.dtype)
        x = jax.lax.dynamic_update_slice_in_dim(x, rows, start, 0)
        aux = jax.lax.dynamic_update_slice_in_dim(aux, aux_v, start, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(
            valid, jnp.ones(rows_n, dtype=valid.dtype), start, 0)
        return x, aux, valid

    for start in range(0, n_rows, fill_chunk):
        eng.x, eng.aux, eng.valid = fill(
            eng.x, eng.aux, eng.valid, start,
            rows_n=min(fill_chunk, n_rows - start))
    # Direct array fill bypasses engine.write: int8+l2's |x_hat|^2 lane
    # must be rebuilt or the fused kernel scores garbage (caught by the
    # recall probe below at 0.195 when this was missing).
    eng.rebuild_norms()
    jax.block_until_ready(eng.x)

    rng = np.random.default_rng(42)
    q_host = rng.standard_normal((batch, dim)).astype(np.float32)
    # Pre-stage queries on device: the benchmark measures the engine, not
    # the host link (production h2d of a 786 KB query tile is ~50 us over
    # PCIe; the dev tunnel would charge ~25 ms).
    from vrod_tpu.parallel.mesh import replicated
    q = jax.device_put(q_host, replicated(eng.mesh))
    jax.block_until_ready(q)

    # Warm-up: compile + first (slow) host transfer, then a short timed-loop
    # ramp — the first measured loop in a process runs ~2x slow on the dev
    # tunnel regardless of compilation state.
    vals, idx = eng.search(q, k, margin=rescore_margin)
    for _ in range(5):
        v_w, i_w = eng.search(q, k, as_numpy=False, margin=rescore_margin)
    np.asarray(i_w[0, :1])

    # Dispatch all batches asynchronously, sync once on the last result:
    # the device queue is FIFO, so materializing the final batch bounds the
    # whole pipeline without paying one interconnect round trip per batch.
    # The loop's single ~25 ms tunnel readback is amortized over `iters`
    # batches — at the headline's ~4.8 ms batch latency, 40 iters
    # understated QPS by ~11% (measured 48.2k vs 53.4k at 120; 54.9k at
    # 240), hence the long default loop. Best of three loops: the dev
    # tunnel occasionally stalls ~450 ms mid-loop (docs/performance.md),
    # which would understate the steady state in a single capture.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            vals_d, idx_d = eng.search(q, k, as_numpy=False,
                                       margin=rescore_margin)
        np.asarray(idx_d)
        dt = min(dt, time.perf_counter() - t0)
    qps = batch * iters / dt

    # Latency percentiles (north-star metric includes p99, BASELINE.md:16).
    # Per-batch sync timing: each sample pays one device->host readback, so
    # on the dev tunnel these include ~20-25 ms RTT; the pipeline batch
    # latency above is the throughput-mode number.
    pcts = None
    if percentiles:
        samples = []
        for i in range(50):
            t1 = time.perf_counter()
            v, ix = eng.search(q, k, as_numpy=False, margin=rescore_margin)
            np.asarray(ix[0, :1])  # minimal readback forces completion
            samples.append(time.perf_counter() - t1)
        a = np.array(samples)
        pcts = {"p50_ms": round(float(np.percentile(a, 50)) * 1e3, 3),
                "p95_ms": round(float(np.percentile(a, 95)) * 1e3, 3),
                "p99_ms": round(float(np.percentile(a, 99)) * 1e3, 3)}

    # Exactness probe over the FULL collection, on device: the production
    # path's scores vs an exact-precision scan-path oracle for 8 queries;
    # only one scalar crosses the host link. Tie-aware via the eps band.
    recall = device_recall_probe(eng, q[:8], k, margin=rescore_margin)
    return qps, dt / iters, recall, pcts


def device_recall_probe(eng, q, k, eps=1e-5, margin=None):
    """recall@k of the production search vs an exact-precision full-N
    oracle, computed entirely on device (VERDICT r1: probe the actual
    1M-row scan, not a masked subset)."""
    import numpy as np
    vals_e, idx_e = eng.search(q, k, as_numpy=False, margin=margin)
    vals_o, _ = eng.search(q, k, impl="scan", precision="exact",
                           rescore=False, as_numpy=False)
    # A failed-masking bug could return one slot k times with valid-looking
    # scores; per-row index uniqueness closes that blind spot (tiny readback).
    ih = np.asarray(idx_e)
    for b in range(ih.shape[0]):
        live = ih[b][ih[b] >= 0]
        assert np.unique(live).size == live.size, \
            f"duplicate slots in top-k row {b}: {ih[b]}" 
    lower_better = eng.cfg.metric == "l2"
    kth = np.asarray(vals_o[:, k - 1:k])
    ve = np.asarray(vals_e)
    scale = np.maximum(np.abs(kth), 1.0)
    if lower_better:
        hits = ve <= kth + eps * scale
    else:
        hits = ve >= kth - eps * scale
    return float(hits.mean())


def cpu_qps(n_rows, dim, batch, k, subset, metric="cosine"):
    """Single-CPU NumPy brute force AT THE REQUESTED METRIC, measured on
    `subset` rows and scaled linearly to n_rows (brute-force cost is
    linear in N) — the vs_baseline comparator must run the same workload."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((subset, dim)).astype(np.float32)
    q = rng.standard_normal((batch, dim)).astype(np.float32)
    if metric == "cosine":
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        q = q / np.linalg.norm(q, axis=1, keepdims=True)

    def scan(qq):
        if metric == "l2":
            s = (np.sum(qq * qq, axis=1, keepdims=True)
                 - 2.0 * (qq @ x.T) + np.sum(x * x, axis=1)[None, :])
            return np.argpartition(s, k, axis=1)[:, :k]
        s = qq @ x.T  # cosine (pre-normalized) and dot
        return np.argpartition(-s, k, axis=1)[:, :k]

    scan(q[:8])  # warm-up, then best-of-3 (single-core baseline is noisy)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        scan(q)
        best = min(best, time.perf_counter() - t0)
    dt_scaled = best * (n_rows / subset)
    return batch / dt_scaled


def mixed_workload(n_rows, dim, iters, dtype="float32"):
    """BASELINE config 4: mixed insert/delete/search with compaction and a
    WAL-backed restore. Reports aggregate ops/sec."""
    import tempfile
    from vrod_tpu.database import Database

    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as tmp:
        db = Database.new(tmp, "benchdb", wal_sync=False)
        col = db.create_collection("m", dim=dim, segment_rows=65536,
                                   dtype=dtype)
        base = rng.standard_normal((n_rows, dim)).astype(np.float32)
        col.bulk_insert(base)
        # Warm up every compiled shape the loop uses (insert 256, delete
        # 128, search 64) so the timed region measures steady state, not
        # compiles.
        warm_ids = col.bulk_insert(base[:256])
        col.delete_many(warm_ids[:128])
        col.delete_many(warm_ids[128:])
        col.search_similar(base[:64], k=10)
        ops_done = 0
        reindex_s = 0.0
        t0 = time.perf_counter()
        live_ids = list(range(1, n_rows + 1))
        for i in range(iters):
            ins = rng.standard_normal((256, dim)).astype(np.float32)
            new_ids = col.bulk_insert(ins)
            ops_done += 256
            dead = rng.choice(live_ids, size=128, replace=False)
            col.delete_many(dead)
            live_ids = [x for x in live_ids if x not in set(dead.tolist())]
            live_ids.extend(new_ids.tolist())
            ops_done += 128
            col.search_similar(ins[:64], k=10)
            ops_done += 64
            if i == iters // 2:
                # Compaction triggers a full snapshot (device->host gather +
                # disk write); report it separately — it's a maintenance
                # event, not per-op cost.
                tr = time.perf_counter()
                col.reindex()
                reindex_s = time.perf_counter() - tr
        dt = time.perf_counter() - t0 - reindex_s
        # WAL/snapshot restore path. Free the first copy's device arrays
        # before loading the second: buffer donation is unavailable over
        # the dev tunnel, so holding both copies would double HBM.
        t1 = time.perf_counter()
        db.close()
        del col, db
        import gc
        gc.collect()
        db2 = Database.load(f"{tmp}/benchdb", wal_sync=False)
        col2 = db2.collection("m")
        restore_s = time.perf_counter() - t1
        count = col2.count
        db2.close()
        return ops_done / dt, restore_s, count, reindex_s


def serve_workload(n_rows, dim, k, n_clients, per_client, dtype,
                   req_batch=1):
    """End-to-end serving: a unix-socket VrodServer over a temp database,
    ``n_clients`` concurrent connections each issuing single-query searches
    (the worst case for a TPU — batch 1 is dispatch-bound). The frontend
    micro-batches across connections into shared MXU tiles; correctness is
    built in (every query is a stored vector whose top-1 must be itself).
    Reports aggregate client-observed QPS + the achieved batching ratio.

    ``req_batch > 1`` switches to client-side batched requests
    (``search_similar_batch``: one engine call per request, packed
    binary/raw responses) — the bulk-retrieval wire path rather than the
    micro-batching frontend."""
    import tempfile
    import threading
    from vrod_tpu import metrics
    from vrod_tpu.client import VrodClient
    from vrod_tpu.database import Database
    from vrod_tpu.server import VrodServer

    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as tmp:
        db = Database.new(tmp, "servedb", wal_sync=False)
        col = db.create_collection("s", dim=dim, dtype=dtype,
                                   segment_rows=min(n_rows, 262144))
        vecs = rng.standard_normal((n_rows, dim)).astype(np.float32)
        for i in range(0, n_rows, 65536):  # bounded WAL frames / host RAM
            col.bulk_insert(vecs[i:i + 65536])
        # Warm every compiled shape the batcher can produce with N clients:
        # pending sizes 1..N pad to buckets, INCLUDING the covering bucket
        # when N is not itself a bucket value (e.g. 48 clients -> tile 64).
        from vrod_tpu.engine import BATCH_BUCKETS, _bucket
        cover = _bucket(min(n_clients if req_batch == 1 else req_batch,
                            256), BATCH_BUCKETS)
        buckets = sorted(
            {b for b in BATCH_BUCKETS if b <= cover} | {1, cover})
        for b in buckets:
            col.search_similar(vecs[:b], k)
        with VrodServer(db, f"unix:{tmp}/bench.sock",
                        max_wait_ms=2.0) as server:
            server.start()
            errors = []
            start = threading.Barrier(n_clients + 1)
            lat = [[] for _ in range(n_clients)]

            def worker(tid):
                try:
                    with VrodClient(server.address) as c:
                        start.wait(timeout=120)
                        if req_batch > 1:
                            for _ in range(per_client):
                                idx = rng.integers(0, n_rows,
                                                   size=req_batch)
                                t0 = time.perf_counter()
                                bat = c.search_similar_batch(
                                    "s", vecs[idx], k=k)
                                lat[tid].append(time.perf_counter() - t0)
                                for j, i in enumerate(idx):
                                    if bat[j][0].record_id != int(i) + 1:
                                        raise AssertionError(
                                            f"row {j} of query batch: "
                                            f"top-1 {bat[j][0].record_id}"
                                            f" want {int(i) + 1}")
                            return
                        idx = rng.integers(0, n_rows, size=per_client)
                        for i in idx:
                            t0 = time.perf_counter()
                            hits = c.search_similar("s", vecs[i], k=k)
                            lat[tid].append(time.perf_counter() - t0)
                            if hits[0].record_id != int(i) + 1:
                                raise AssertionError(
                                    f"query {i}: top-1 {hits[0].record_id}")
                except Exception as e:
                    errors.append(e)
                    start.abort()

            before = metrics.counters.snapshot()
            threads = [threading.Thread(target=worker, args=(t,))
                       for t in range(n_clients)]
            for t in threads:
                t.start()
            try:
                start.wait(timeout=120)
            except threading.BrokenBarrierError:
                for t in threads:
                    t.join(timeout=10)
                raise (errors[0] if errors
                       else RuntimeError("client barrier broke"))
            t0 = time.perf_counter()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            if errors:
                raise errors[0]
            after = metrics.counters.snapshot()
        db.close()
        queries = n_clients * per_client * req_batch
        batches = (after.get("frontend.batch", 0)
                   - before.get("frontend.batch", 0))
        all_lat = sorted(x for per in lat for x in per)
        p50 = all_lat[len(all_lat) // 2]
        p99 = all_lat[min(len(all_lat) - 1, int(len(all_lat) * 0.99))]
        # Server-side view (excludes client codec + socket): the spread
        # vs client-observed latency is the transport/codec cost.
        srv = metrics.latencies.quantiles("server.request")
        return (queries / dt, queries / max(batches, 1), p50, p99, srv)


def main():
    from vrod_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small config for smoke runs")
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=768,
                    help="vector dimension (search workload; config 1 uses 128)")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=None)
    # int8 storage is the headline default (round 3): same
    # exact-vs-stored-representation contract as bf16 (exact f32-query
    # rescore of dequantized candidates; the on-device oracle re-verifies
    # recall every run), measured +15% QPS over bf16 at top-16 AND top-100
    # in the same session, with 2x the per-chip capacity — and recall 1.0
    # held at 10M x 768 with the margin-12 policy. bf16/f32 via --dtype.
    # (Resolved after parsing: the int8 default falls back to bfloat16
    # where int8+l2 is unsupported, dim > 1040.)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--impl", default=None)
    ap.add_argument("--precision", default=None)
    ap.add_argument("--workload", default="search",
                    choices=["search", "mixed", "batch-sweep", "scaling",
                             "serve", "serve-batch"])
    ap.add_argument("--clients", type=int, default=32,
                    help="concurrent connections for --workload serve")
    ap.add_argument("--shards", type=int, default=1)
    ap.add_argument("--metric", default="cosine",
                    choices=["cosine", "l2", "dot"])
    ap.add_argument("--margin", type=int, default=None,
                    help="override rescore candidate margin (k_scan = k_out + margin)")
    args = ap.parse_args()
    if args.dtype is None:
        # int8 everywhere: the fused kernel's int8+l2 epilogue (per-query
        # quant scale + |x_hat|^2 mask bias) measured 54.6k QPS recall 1.0
        # at 1M x 768 — ahead of bf16 l2 (46.3k) with 2x capacity. The one
        # exception is the config-level cap int8+l2 carries (dim <= 1040,
        # |q8|^2 f32 exactness): larger dims fall back to bfloat16 so the
        # driver contract (one JSON line, never a traceback) holds.
        args.dtype = ("bfloat16" if args.metric == "l2" and args.dim > 1040
                      else "int8")
    global _WORKLOAD
    _WORKLOAD = args.workload

    # Driver-capture resilience (VERDICT r3 item 1): never die on a raw
    # traceback because the tunnel was down at capture time.
    err = wait_for_backend()
    if err:
        fail_json(args.workload, err)

    if args.workload == "batch-sweep":
        # BASELINE config 3: top-100 over a large collection, batch sweep.
        n_rows = args.rows or (131072 if args.quick else 1_000_000)
        # Small batches need long loops: the loop's one ~25 ms sync
        # readback would otherwise dominate a 10-iter batch-1 point.
        iters = args.iters or (3 if args.quick else 60)
        curve = {}
        for b in (1, 16, 64, 256, 1024):
            qps, lat, recall, _ = tpu_qps(n_rows, 768, b, 100, iters,
                                          dtype=args.dtype,
                                          shards=args.shards)
            curve[str(b)] = {"qps": round(qps, 1),
                             "batch_latency_ms": round(lat * 1e3, 3),
                             "recall_full_scan@k": recall}
        best = max(v["qps"] for v in curve.values())
        print(json.dumps({
            "metric": f"exact cosine top-100 QPS/chip, {n_rows}x768, batch sweep",
            "value": best, "unit": "queries/s", "vs_baseline": None,
            "extra": {"curve": curve},
        }))
        return

    if args.workload == "scaling":
        # BASELINE config 5: rows sharded over N chips, all-gather merge.
        from vrod_tpu.runtime import default_devices
        n_dev = len(default_devices())
        n_rows = args.rows or (131072 if args.quick else 1_000_000)
        iters = args.iters or (3 if args.quick else 10)
        curve = {}
        shards_list = [s for s in (1, 2, 4, 8) if s <= n_dev]
        recall = None
        for s in shards_list:
            qps, lat, recall, _ = tpu_qps(n_rows, 768, args.batch, args.k,
                                          iters, dtype=args.dtype, shards=s)
            curve[str(s)] = round(qps, 1)
        base = curve[str(shards_list[0])]
        print(json.dumps({
            "metric": f"exact cosine top-{args.k} QPS scaling, {n_rows}x768",
            "value": curve[str(shards_list[-1])], "unit": "queries/s",
            "vs_baseline": round(curve[str(shards_list[-1])] / base, 2),
            "extra": {"qps_by_shards": curve, "devices_available": n_dev,
                      "recall_full_scan@k": recall},
        }))
        return

    if args.workload == "serve":
        # End-to-end serving: concurrent batch-1 clients through the
        # socket server; the frontend's cross-client micro-batching is
        # what separates this from the ~100-300 QPS a batch-1 loop gets.
        n_rows = args.rows or (32768 if args.quick else 262144)
        per_client = args.iters or (4 if args.quick else 40)
        qps, batch_ratio, p50, p99, srv = serve_workload(
            n_rows, args.dim, args.k, args.clients, per_client,
            dtype=args.dtype)
        print(json.dumps({
            "metric": f"end-to-end served QPS, {n_rows}x{args.dim}, "
                      f"{args.clients} batch-1 clients",
            "value": round(qps, 1),
            "unit": "queries/s",
            "vs_baseline": None,
            "extra": {"avg_queries_per_tile": round(batch_ratio, 1),
                      "client_p50_ms": round(p50 * 1e3, 2),
                      "client_p99_ms": round(p99 * 1e3, 2),
                      "server_request": srv,
                      "recall_spotcheck": 1.0},
        }))
        return

    if args.workload == "serve-batch":
        # Bulk-retrieval wire path: few clients, big batched requests
        # (binary vectors in, raw packed hits out) — one engine call per
        # request, so this measures scan + wire codec, not micro-batching.
        n_rows = args.rows or (32768 if args.quick else 262144)
        per_client = args.iters or (3 if args.quick else 20)
        n_clients = min(args.clients, 4) if args.clients == 32 \
            else args.clients
        qps, _, p50, p99, srv = serve_workload(
            n_rows, args.dim, args.k, n_clients, per_client,
            dtype=args.dtype, req_batch=args.batch)
        print(json.dumps({
            "metric": f"served batched QPS, {n_rows}x{args.dim}, "
                      f"{n_clients} clients x batch {args.batch} "
                      f"top-{args.k}",
            "value": round(qps, 1),
            "unit": "queries/s",
            "vs_baseline": None,
            "extra": {"request_p50_ms": round(p50 * 1e3, 2),
                      "request_p99_ms": round(p99 * 1e3, 2),
                      "server_request": srv,
                      "recall_spotcheck": 1.0},
        }))
        return

    if args.workload == "mixed":
        n_rows = args.rows or (65536 if args.quick else 262144)
        ops_s, restore_s, count, reindex_s = mixed_workload(
            n_rows, 768, args.iters or (3 if args.quick else 10),
            dtype=args.dtype)
        print(json.dumps({
            "metric": f"mixed insert/delete/search ops/s, base {n_rows}x768",
            "value": round(ops_s, 1),
            "unit": "ops/s",
            "vs_baseline": None,
            "extra": {"restore_seconds": round(restore_s, 2),
                      "reindex_seconds": round(reindex_s, 2),
                      "final_count": count},
        }))
        return

    n_rows = args.rows or (131072 if args.quick else 1_000_000)
    # Enough pipelined batches to amortize per-dispatch overhead AND the
    # loop's one ~25 ms sync readback (240 x 4.8 ms -> ~2% overhead).
    iters = args.iters or (5 if args.quick else 240)
    dim, batch, k = args.dim, args.batch, args.k

    qps, lat, recall, pcts = tpu_qps(n_rows, dim, batch, k, iters,
                                     metric=args.metric,
                                     dtype=args.dtype, impl=args.impl,
                                     precision=args.precision,
                                     rescore_margin=args.margin,
                                     percentiles=True)
    cpu = cpu_qps(n_rows, dim, batch, k, metric=args.metric,
                  subset=min(n_rows, 65536 if args.quick else 131072))

    print(json.dumps({
        "metric": f"exact {args.metric} top-{k} QPS/chip, {n_rows}x{dim}, batch {batch}",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / cpu, 2),
        "extra": {
            "batch_latency_ms": round(lat * 1e3, 3),
            "latency_percentiles": pcts,
            "recall_full_scan@k": recall,
            "cpu_brute_force_qps": round(cpu, 2),
            "dtype": args.dtype,
        },
    }))


_WORKLOAD = "search"

if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except KeyboardInterrupt:
        raise
    except Exception as e:
        # A mid-run backend loss (or any other crash) must still leave the
        # driver one parseable JSON line instead of a traceback.
        import traceback
        traceback.print_exc(file=sys.stderr)
        fail_json(_WORKLOAD, f"{type(e).__name__}: {e}", code=2)
