"""Collection: durable, mutable, TPU-resident vector set.

Realizes the reference's intended ``Database.collections`` member
(``/root/reference/src/database/mod.rs:8`` — a TODO comment) as:

  host   C++ slot allocator (free-list, live bitmap, id<->slot binding)
       + C++ WAL (CRC-framed, fsync'd before device mutation is acked)
       + payload table (id -> string payload)
  device (capacity, dim) embedding tensor + aux + validity, row-sharded
         over the mesh (see ``vrod_tpu/engine.py``)

Durability: every mutation appends to the collection WAL *before* touching
device state; ``snapshot()`` persists live records + payloads, then truncates
the WAL (its frames are captured). ``load()`` = snapshot restore + WAL tail
replay; replay is idempotent so a crash between snapshot and truncate is
safe. Record model is the reference's ``(f32 embedding, string payload)``
(``src/utils/embeddings.rs:61``).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np

from .allocator import NO_ID, SlotAllocator
from .config import (
    CONFIG_FILE, SNAPSHOT_DIR, WAL_FILE, CollectionConfig,
    read_config, write_config,
)
from .engine import DeviceEngine
from .errors import (
    DimensionMismatchError, RecordNotFoundError,
)
from . import metrics
from .records import Record
from .utils.locks import RWLock
from .wal import Wal, ops


class SearchHit:
    __slots__ = ("record_id", "score", "payload")

    def __init__(self, record_id: int, score: float, payload: str):
        self.record_id = record_id
        self.score = score
        self.payload = payload

    def __repr__(self):
        return f"SearchHit(id={self.record_id}, score={self.score:.6g}, payload={self.payload!r})"


class Collection:
    def __init__(self, path: Path, config: CollectionConfig, *,
                 devices=None, mesh=None, wal_sync: bool = True):
        self.path = Path(path)
        self.config = config
        self.wal_sync = wal_sync
        self._devices = devices
        self._mesh = mesh
        self.engine = DeviceEngine(config, mesh=mesh, devices=devices)
        self.alloc = SlotAllocator(self.engine.capacity)
        self.wal = Wal(self.path / WAL_FILE)
        self.payloads: dict[int, str] = {}
        self.next_id = 1
        # Single-writer / multi-reader: mutations donate device buffers, so
        # a concurrent search must never hold the old arrays (SURVEY §5).
        self._rw = RWLock()

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(cls, path: Path, config: CollectionConfig, **kw) -> "Collection":
        path = Path(path)
        path.mkdir(parents=True, exist_ok=False)
        write_config(path / CONFIG_FILE, config.to_json())
        (path / WAL_FILE).touch()
        return cls(path, config, **kw)

    @classmethod
    def load(cls, path: Path, **kw) -> "Collection":
        path = Path(path)
        config = CollectionConfig.from_json(read_config(path / CONFIG_FILE))
        col = cls(path, config, **kw)
        col._restore()
        return col

    def close(self) -> None:
        self.wal.close()

    # -- invariants --------------------------------------------------------

    def _check_dim(self, vecs: np.ndarray) -> np.ndarray:
        vecs = np.atleast_2d(np.asarray(vecs, dtype=np.float32))
        if vecs.shape[1] != self.config.dim:
            raise DimensionMismatchError(
                f"Vector dim {vecs.shape[1]} != collection dim {self.config.dim}")
        return vecs

    def _ensure_capacity(self, n_new: int) -> None:
        needed = self.alloc.live_count + n_new
        if self.engine.ensure_capacity(needed):
            self.alloc.grow(self.engine.capacity)
        elif self.alloc.capacity < self.engine.capacity:
            self.alloc.grow(self.engine.capacity)

    @property
    def count(self) -> int:
        return self.alloc.live_count

    # -- mutations (WAL first, then device) --------------------------------

    def insert(self, vector, payload: str = "") -> int:
        vecs = self._check_dim(vector)
        with self._rw.write():
            rid = self.next_id
            self.wal.append(
                ops.encode(ops.InsertOp(rid, vecs[0], payload)),
                sync=self.wal_sync)
            self._apply_insert(np.array([rid], dtype=np.uint64), vecs, [payload])
        metrics.counters.inc("collection.inserts")
        return rid

    def bulk_insert(self, vectors, payloads=None) -> np.ndarray:
        vecs = self._check_dim(vectors)
        n = vecs.shape[0]
        if payloads is None:
            payloads = [""] * n
        if len(payloads) != n:
            raise ValueError("payloads length must match vectors")
        with self._rw.write():
            rids = np.arange(self.next_id, self.next_id + n, dtype=np.uint64)
            self.wal.append(
                ops.encode(ops.BulkOp(rids, vecs, list(payloads))),
                sync=self.wal_sync)
            self._apply_insert(rids, vecs, payloads)
        metrics.counters.inc("collection.inserts", n)
        return rids

    def _apply_insert(self, rids: np.ndarray, vecs: np.ndarray, payloads) -> None:
        self._ensure_capacity(len(rids))
        slots = self.alloc.acquire(rids)
        self.engine.write(slots, vecs)
        for rid, p in zip(rids.tolist(), payloads):
            self.payloads[rid] = p
        self.next_id = max(self.next_id, int(rids.max()) + 1)

    def delete(self, record_id: int) -> None:
        with self._rw.write():
            if self.alloc.slot_of(record_id) == NO_ID:
                raise RecordNotFoundError(f"No record with id {record_id}")
            self.wal.append(
                ops.encode(ops.DeleteOp(record_id)), sync=self.wal_sync)
            self._apply_delete(record_id)
        metrics.counters.inc("collection.deletes")

    def delete_many(self, record_ids) -> int:
        """Bulk DELETE: one WAL frame, one device scatter. Unknown ids are
        skipped; returns the number actually deleted."""
        rids = np.asarray(record_ids, dtype=np.uint64).reshape(-1)
        with self._rw.write():
            known = np.array(
                [r for r in rids.tolist() if self.alloc.slot_of(r) != NO_ID],
                dtype=np.uint64)
            if known.size == 0:
                return 0
            self.wal.append(ops.encode(ops.BulkDeleteOp(known)),
                            sync=self.wal_sync)
            self._apply_bulk_delete(known)
        metrics.counters.inc("collection.deletes", int(known.size))
        return int(known.size)

    def _apply_bulk_delete(self, rids: np.ndarray) -> None:
        slots = self.alloc.release(rids)
        live = slots[slots != NO_ID]
        if live.size:
            self.engine.erase(live)
        for rid in rids.tolist():
            self.payloads.pop(rid, None)

    def _apply_delete(self, record_id: int) -> None:
        slots = self.alloc.release(np.array([record_id], dtype=np.uint64))
        live = slots[slots != NO_ID]
        if live.size:
            self.engine.erase(live)
        self.payloads.pop(record_id, None)

    def update(self, record_id: int, vector, payload: str = "") -> None:
        """UPDATE = delete + insert under the same record id
        (reference: UpdateCommand stub, types.rs:82-93)."""
        vecs = self._check_dim(vector)
        with self._rw.write():
            if self.alloc.slot_of(record_id) == NO_ID:
                raise RecordNotFoundError(f"No record with id {record_id}")
            self.wal.append(
                ops.encode(ops.UpdateOp(record_id, vecs[0], payload)),
                sync=self.wal_sync)
            self._apply_update(record_id, vecs, payload)

    def _apply_update(self, record_id: int, vecs: np.ndarray, payload: str) -> None:
        self._apply_delete(record_id)
        self._apply_insert(
            np.array([record_id], dtype=np.uint64), vecs, [payload])

    # -- reads -------------------------------------------------------------

    def get(self, record_id: int) -> Record:
        """Exact lookup (the reference's SEARCH verb, types.rs:108-119)."""
        with self._rw.read():
            slot = self.alloc.slot_of(record_id)
            if slot == NO_ID:
                raise RecordNotFoundError(f"No record with id {record_id}")
            vec = self.engine.gather(np.array([slot]))[0]
            return Record(vector=vec, payload=self.payloads.get(record_id, ""))

    def search_similar(self, queries, k: int = 10, **search_kw):
        """Exact kNN (the reference's SEARCHSIMILAR verb, types.rs:121-132).

        Returns a list (one entry per query) of lists of SearchHit, best
        first. Scores: cosine similarity / inner product (higher = closer)
        or squared L2 distance (lower = closer).
        """
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        single = np.asarray(queries).ndim == 1
        if q.shape[1] != self.config.dim:
            raise DimensionMismatchError(
                f"Query dim {q.shape[1]} != collection dim {self.config.dim}")
        with metrics.timed("collection.search", collection=self.config.name,
                           batch=int(q.shape[0]), k=k,
                           metric=self.config.metric,
                           shards=self.engine.shards):
            with self._rw.read():
                vals, slots = self.engine.search(q, k, **search_kw)
        # Bulk slot->id mapping (one native call for the whole batch).
        rids = self.alloc.ids_of(
            np.where(slots >= 0, slots, 0).astype(np.uint64)
        ).reshape(slots.shape)
        results = []
        for b in range(q.shape[0]):
            hits = []
            for j in range(vals.shape[1]):
                if slots[b, j] < 0 or rids[b, j] == NO_ID:
                    continue
                hits.append(SearchHit(int(rids[b, j]), float(vals[b, j]),
                                      self.payloads.get(int(rids[b, j]), "")))
            results.append(hits)
        return results[0] if single else results

    # -- maintenance -------------------------------------------------------

    def reindex(self) -> int:
        """REINDEX (reference: types.rs:134-144): compact live rows into
        [0, live_count) — device gather/scatter moves planned by the
        allocator. Returns the number of rows moved."""
        with self._rw.write():
            src, dst = self.alloc.plan_compaction()
            if src.size:
                self.engine.move(src, dst)
                self.alloc.apply_compaction(src, dst)
            # Snapshot makes the compacted layout durable, drops stale WAL.
            self._snapshot_locked()
        metrics.counters.inc("collection.compactions")
        return int(src.size)

    def truncate_wal(self) -> None:
        """TRUNCATEWAL for this collection (reference: types.rs:44-54)."""
        with self._rw.write():
            self.wal.truncate()

    # -- persistence -------------------------------------------------------

    def snapshot(self) -> Path:
        """Persist live records; then the WAL is redundant and truncated."""
        with self._rw.write():
            return self._snapshot_locked()

    def _snapshot_locked(self) -> Path:
        snap_dir = self.path / SNAPSHOT_DIR
        tmp_dir = self.path / (SNAPSHOT_DIR + ".tmp")
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)
        tmp_dir.mkdir(parents=True)
        live_slots = self.alloc.live_slots()
        rids = np.array([self.alloc.id_of(int(s)) for s in live_slots],
                        dtype=np.uint64)
        # Chunked device->host gather: bounds peak host memory per transfer
        # and pipelines readback with the next chunk's device gather.
        chunk = self.engine.WRITE_CHUNK_ROWS
        vecs = np.empty((live_slots.size, self.config.dim), np.float32)
        for start in range(0, live_slots.size, chunk):
            sl = live_slots[start:start + chunk].astype(np.int64)
            vecs[start:start + chunk] = self.engine.gather(sl)
        np.save(tmp_dir / "ids.npy", rids)
        np.save(tmp_dir / "vectors.npy", vecs)
        (tmp_dir / "payloads.json").write_text(json.dumps(
            {str(r): self.payloads.get(int(r), "") for r in rids.tolist()}))
        import zlib
        checksums = {
            f: zlib.crc32((tmp_dir / f).read_bytes()) & 0xFFFFFFFF
            for f in ("ids.npy", "vectors.npy", "payloads.json")
        }
        (tmp_dir / "meta.json").write_text(json.dumps({
            "next_id": self.next_id,
            "count": int(rids.size),
            "last_lsn": self.wal.last_lsn,
            "crc32": checksums,
        }))
        if snap_dir.exists():
            shutil.rmtree(snap_dir)
        tmp_dir.replace(snap_dir)
        self.wal.truncate()
        return snap_dir

    def _restore(self) -> None:
        snap_dir = self.path / SNAPSHOT_DIR
        if snap_dir.exists():
            meta = json.loads((snap_dir / "meta.json").read_text())
            import zlib
            from .errors import WalCorruptionError
            for f, expect in meta.get("crc32", {}).items():
                got = zlib.crc32((snap_dir / f).read_bytes()) & 0xFFFFFFFF
                if got != expect:
                    raise WalCorruptionError(
                        f"Snapshot file {f} corrupt (crc {got:#x} != "
                        f"{expect:#x}); restore from WAL or a backup")
            rids = np.load(snap_dir / "ids.npy")
            vecs = np.load(snap_dir / "vectors.npy")
            payloads_map = json.loads((snap_dir / "payloads.json").read_text())
            if rids.size:
                self._apply_insert(
                    rids, vecs,
                    [payloads_map.get(str(r), "") for r in rids.tolist()])
            self.next_id = max(self.next_id, int(meta["next_id"]))
        # Crash recovery: drop any torn tail, then replay the durable prefix.
        if self.wal.has_torn_tail:
            self.wal.repair()
        for _lsn, frame in self.wal.replay():
            self._replay_op(ops.decode(frame))

    def _replay_op(self, op) -> None:
        """Idempotent replay: re-applying an already-applied op is a no-op."""
        if isinstance(op, ops.BulkOp):
            mask = np.array([self.alloc.slot_of(int(r)) == NO_ID
                             for r in op.record_ids])
            if mask.any():
                self._apply_insert(op.record_ids[mask], op.vectors[mask],
                                   [p for p, m in zip(op.payloads, mask) if m])
            self.next_id = max(self.next_id, int(op.record_ids.max()) + 1)
        elif isinstance(op, ops.InsertOp):
            if self.alloc.slot_of(op.record_id) == NO_ID:
                self._apply_insert(
                    np.array([op.record_id], dtype=np.uint64),
                    op.vector[None, :], [op.payload])
            self.next_id = max(self.next_id, op.record_id + 1)
        elif isinstance(op, ops.DeleteOp):
            if self.alloc.slot_of(op.record_id) != NO_ID:
                self._apply_delete(op.record_id)
        elif isinstance(op, ops.BulkDeleteOp):
            known = np.array(
                [r for r in op.record_ids.tolist()
                 if self.alloc.slot_of(r) != NO_ID], dtype=np.uint64)
            if known.size:
                self._apply_bulk_delete(known)
        elif isinstance(op, ops.UpdateOp):
            self._apply_update(op.record_id, op.vector[None, :], op.payload)
            self.next_id = max(self.next_id, op.record_id + 1)
        elif isinstance(op, ops.CheckpointOp):
            pass
        else:
            raise TypeError(f"Unexpected op in collection WAL: {op}")

    # -- stats -------------------------------------------------------------

    def stats(self) -> dict:
        return {
            "name": self.config.name,
            "dim": self.config.dim,
            "metric": self.config.metric,
            "dtype": self.config.dtype,
            "count": self.count,
            "capacity": self.engine.capacity,
            "high_water": self.alloc.high_water,
            "shards": self.engine.shards,
            "wal_frames": self.wal.frame_count,
        }
