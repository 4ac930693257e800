"""Multi-host (DCN) support: process-group init + global row meshes.

The reference has no distribution at all (single-threaded
``Rc<RefCell<Database>>``, ``/root/reference/src/command/types.rs:10``);
vrod-tpu scales TPU-natively in two tiers:

  * within a slice: row-sharding over the ICI mesh (``mesh.py``), top-k
    merged by an XLA all-gather — cheap, rides ICI.
  * across hosts/slices: the SAME shard_map program over a global mesh
    whose devices span processes; XLA routes the top-k merge collective
    over DCN. The merge payload is tiny (shards x k x 8 bytes per query),
    so this stays latency- not bandwidth-bound.

SPMD discipline: every process runs the same program with the same
(replicated) query/mutation inputs; device state lives sharded across all
hosts' devices. Host-side truth (WAL, allocator) follows a
leader-process model: rank 0 owns durability, others replay (the same
discipline as the single-host engine where the WAL is host-truth and HBM
is reconstructible).

Usage (one call per process, before building collections):

    from vrod_tpu.parallel import distributed
    distributed.initialize()          # env-driven, see below
    eng = DeviceEngine(cfg, devices=jax.devices())  # global mesh

Environment variables (mirroring ``jax.distributed.initialize``):
    VROD_COORDINATOR   host:port of rank 0 (e.g. "10.0.0.1:8476")
    VROD_NUM_PROCESSES total process count
    VROD_PROCESS_ID    this process's rank
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the process group. Arguments default to the VROD_* env vars;
    no-op when neither arguments nor env vars are present (single host)."""
    global _initialized
    if _initialized:
        return
    coordinator = coordinator or os.environ.get("VROD_COORDINATOR")
    if num_processes is None and "VROD_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VROD_NUM_PROCESSES"])
    if process_id is None and "VROD_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VROD_PROCESS_ID"])
    if coordinator is None and num_processes is None and process_id is None:
        return  # single-host
    if coordinator is None or num_processes is None or process_id is None:
        # A half-configured launch (e.g. VROD_PROCESS_ID exported but the
        # coordinator var typo'd) must not silently serve as an
        # independent single-host node: that process would own its own
        # WAL and fork durable truth from the group it meant to join.
        raise RuntimeError(
            "Incomplete multi-host configuration: VROD_COORDINATOR, "
            "VROD_NUM_PROCESSES and VROD_PROCESS_ID must all be set "
            f"(got coordinator={coordinator!r}, "
            f"num_processes={num_processes!r}, process_id={process_id!r})")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def coordination_client():
    """The process group's HOST-side coordination-service client (KV store
    + barriers over the DCN control plane) — or ``None`` outside a
    distributed init. Collective maintenance uses it for cross-rank
    agreement WITHOUT dispatching device collectives: a device collective
    must occupy the same position in every rank's dispatch stream, which is
    exactly the property agreement is trying to establish, so the agreement
    channel itself must not be one."""
    try:
        from jax._src import distributed as _jd
        return _jd.global_state.client
    except Exception:
        return None


def kv_exchange(client, prefix: str, rank: int, nprocs: int,
                payload: str, timeout_s: float):
    """One host-side allgather round over the coordination KV store:
    publish ``payload`` under ``prefix/<rank>`` and blocking-read every
    rank's. ``prefix`` must be globally unique per round (the store has no
    overwrite or rollback here — see Collection's nonce/seq key scheme)."""
    client.key_value_set(f"{prefix}/{rank}", payload)
    timeout_ms = max(int(timeout_s * 1000), 1)
    return [client.blocking_key_value_get(f"{prefix}/{r}", timeout_ms)
            for r in range(nprocs)]


def is_leader() -> bool:
    """Rank 0 owns host-side durability (WAL writes, snapshots)."""
    return jax.process_index() == 0


def global_devices():
    """All devices across the process group, in stable global order."""
    return jax.devices()
