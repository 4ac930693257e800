"""Model-based property test: the collection vs a pure-Python model.

Applies a long randomized sequence of insert / bulk_insert / delete /
delete_many / update / reindex / snapshot / crash-reload operations to a
Collection and to an in-memory dict model, and asserts observable
equivalence (count, get(), exact top-1 search for stored vectors) at every
checkpoint. The reload uses a fresh Collection.load, so WAL replay and
snapshot restore are continuously exercised.
"""

import numpy as np
import pytest

from vrod_tpu.collection import Collection
from vrod_tpu.config import CollectionConfig
from vrod_tpu.errors import RecordNotFoundError

DIM = 12


@pytest.mark.parametrize("seed,cfg_kw", [
    (7, {}),
    (42, {}),
    # The same op-sequence invariants must hold with the sqlite payload
    # view and with budget-triggered background snapshots interleaving.
    (7, {"payload_store": "disk", "auto_snapshot_wal_bytes": 8 * 1024}),
])
def test_random_ops_match_model(tmp_path, seed, cfg_kw):
    rng = np.random.default_rng(seed)
    cfg = CollectionConfig(name="m", dim=DIM, segment_rows=64, **cfg_kw)
    col = Collection.create(tmp_path / "m", cfg)
    model: dict[int, tuple[np.ndarray, str]] = {}

    def check():
        assert col.count == len(model)
        if not model:
            return
        # spot-check a few records
        sample = list(model)[:: max(len(model) // 5, 1)]
        for rid in sample:
            rec = col.get(rid)
            np.testing.assert_allclose(rec.vector, model[rid][0], rtol=1e-6)
            assert rec.payload == model[rid][1]
        # exact search: querying a stored vector returns it first
        rid = sample[0]
        hits = col.search_similar(model[rid][0], k=1)
        got_vec = model[hits[0].record_id][0]
        # (a duplicate vector may legitimately win the tie)
        np.testing.assert_allclose(got_vec, model[rid][0], rtol=1e-5)
        # filtered search: within a random live subset, the oracle top-1 by
        # true cosine must match (filters survive slot reuse/compaction)
        subset = list(model)[:: max(len(model) // 7, 1)]
        q = model[rid][0]
        hits = col.search_similar(q, k=1, within_ids=subset)
        qn = q / max(np.linalg.norm(q), 1e-30)

        def cos(r):
            v = model[r][0].astype(np.float64)
            return float(qn @ (v / max(np.linalg.norm(v), 1e-30)))

        assert hits, "within-filter over live ids returned nothing"
        best = max(cos(r) for r in subset)
        assert cos(hits[0].record_id) >= best - 1e-5
        assert hits[0].record_id in set(subset)
        # exclude filter: the excluded winner must vanish
        hits_ex = col.search_similar(
            q, k=1, exclude_ids=[hits[0].record_id])
        if hits_ex:
            assert hits_ex[0].record_id != hits[0].record_id

    for step in range(120):
        op = rng.integers(0, 100)
        if op < 30:  # insert
            v = rng.standard_normal(DIM).astype(np.float32)
            rid = col.insert(v, f"p{step}")
            model[rid] = (v, f"p{step}")
        elif op < 45:  # bulk insert
            n = int(rng.integers(1, 20))
            vs = rng.standard_normal((n, DIM)).astype(np.float32)
            rids = col.bulk_insert(vs, [f"b{step}-{i}" for i in range(n)])
            for i, r in enumerate(rids.tolist()):
                model[r] = (vs[i], f"b{step}-{i}")
        elif op < 60 and model:  # delete one
            rid = int(rng.choice(list(model)))
            col.delete(rid)
            del model[rid]
        elif op < 70 and model:  # bulk delete
            n = min(len(model), int(rng.integers(1, 10)))
            rids = rng.choice(list(model), size=n, replace=False)
            col.delete_many(rids)
            for r in rids.tolist():
                del model[int(r)]
        elif op < 80 and model:  # update
            rid = int(rng.choice(list(model)))
            v = rng.standard_normal(DIM).astype(np.float32)
            col.update(rid, v, f"u{step}")
            model[rid] = (v, f"u{step}")
        elif op < 88:  # reindex (compaction + snapshot)
            col.reindex()
        elif op < 94:  # snapshot
            col.snapshot()
        else:  # crash-reload (no close: simulates process death)
            # In a real crash the auto-snapshot thread dies with the
            # process; in-process it would keep mutating the old fds while
            # the new Collection owns the dir — wait it out first.
            t = col._autosnap_thread
            if t is not None:
                t.join(timeout=60)
            col = Collection.load(tmp_path / "m")
        if step % 15 == 0:
            check()

    check()
    # final reload must converge to the same state
    col = Collection.load(tmp_path / "m")
    check()
    # every model record reachable; every deleted one is gone
    live = {col.alloc.id_of(int(s)) for s in col.alloc.live_slots()}
    assert live == set(model)
