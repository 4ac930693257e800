"""Fused Pallas kernel correctness (interpret mode on CPU) vs the scan path.

The kernel must be bit-identical in index selection to the lax.scan
implementation at HIGHEST precision: same exact top-k semantics, same
masking, same global index offsets. Real-TPU performance is covered by
bench.py; these tests pin the semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from vrod_tpu.ops import distances as D
from vrod_tpu.ops.pallas_topk import fused_topk, pick_block_rows


def make_data(rng, n, dim, metric, dead_every=0):
    x = jnp.asarray(rng.standard_normal((n, dim)), dtype=jnp.float32)
    if metric == "cosine":
        aux = 1.0 / jnp.linalg.norm(x, axis=1)
    elif metric == "l2":
        aux = jnp.sum(x * x, axis=1)
    else:
        aux = jnp.zeros(n)
    valid = jnp.ones(n, dtype=bool)
    if dead_every:
        valid = valid.at[::dead_every].set(False)
    return x, aux, valid


def both(x, aux, valid, q, k, metric, block_rows, offset=0,
         pipeline="manual"):
    v1, i1 = fused_topk(x, aux, valid, q, k=k, metric=metric,
                        block_rows=block_rows, index_offset=offset,
                        precision_name="exact", interpret=True,
                        pipeline=pipeline)
    v2, i2 = D.blockwise_topk(
        x, aux, valid, q, k=k, metric=metric,
        precision=lax.Precision.HIGHEST, block_rows=block_rows,
        nblocks=x.shape[0] // block_rows, index_offset=offset)
    return (np.asarray(v1), np.asarray(i1)), (np.asarray(v2), np.asarray(i2))


@pytest.mark.parametrize("pipeline", ["manual", "auto"])
@pytest.mark.parametrize("metric", ["cosine", "l2", "dot"])
def test_matches_scan(metric, pipeline, rng):
    x, aux, valid = make_data(rng, 1024, 64, metric, dead_every=7)
    q = jnp.asarray(rng.standard_normal((8, 64)), dtype=jnp.float32)
    (v1, i1), (v2, i2) = both(x, aux, valid, q, 10, metric, 128,
                              pipeline=pipeline)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)


def test_index_offset(rng):
    x, aux, valid = make_data(rng, 256, 32, "dot")
    q = jnp.asarray(rng.standard_normal((8, 32)), dtype=jnp.float32)
    (v1, i1), (v2, i2) = both(x, aux, valid, q, 5, "dot", 128, offset=1000)
    np.testing.assert_array_equal(i1, i2)
    assert (i1 >= 1000).all()


def test_k_exceeds_live(rng):
    x, aux, valid = make_data(rng, 128, 32, "dot")
    valid = valid.at[5:].set(False)  # only 5 live rows
    q = jnp.asarray(rng.standard_normal((8, 32)), dtype=jnp.float32)
    v1, i1 = fused_topk(x, aux, valid, q, k=16, metric="dot",
                        block_rows=128, interpret=True)
    v1, i1 = np.asarray(v1), np.asarray(i1)
    assert ((i1 >= 0).sum(axis=1) == 5).all()
    assert (i1[:, 5:] == -1).all()


def test_all_dead(rng):
    x, aux, valid = make_data(rng, 128, 32, "cosine")
    valid = valid & False
    q = jnp.asarray(rng.standard_normal((8, 32)), dtype=jnp.float32)
    v1, i1 = fused_topk(x, aux, valid, q, k=4, metric="cosine",
                        block_rows=128, interpret=True)
    assert (np.asarray(i1) == -1).all()


def test_duplicate_scores(rng):
    """Ties must resolve to the lowest index, like the scan path."""
    x = jnp.ones((256, 32), dtype=jnp.float32)
    aux = jnp.zeros(256)
    valid = jnp.ones(256, dtype=bool)
    q = jnp.ones((8, 32), dtype=jnp.float32)
    v1, i1 = fused_topk(x, aux, valid, q, k=4, metric="dot",
                        block_rows=128, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(i1), np.tile(np.arange(4), (8, 1)))


def test_multi_query_tile_grid(rng):
    """B larger than one tile exercises the query-tile grid dimension."""
    x, aux, valid = make_data(rng, 512, 32, "dot")
    q = jnp.asarray(rng.standard_normal((16, 32)), dtype=jnp.float32)
    v1, i1 = fused_topk(x, aux, valid, q, k=8, metric="dot",
                        block_rows=128, interpret=True)
    v2, i2 = D.blockwise_topk(x, aux, valid, q, k=8, metric="dot",
                              precision=lax.Precision.HIGHEST,
                              block_rows=128, nblocks=4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_pick_block_rows():
    # 2048 is the measured sweet spot at dim 768 (f32 tile = 6 MB <= 8 MB
    # budget); bf16 also lands on 2048.
    assert pick_block_rows(131072, 768, 4) == 2048
    assert pick_block_rows(131072, 768, 2) == 2048
    # dims too wide for the budget shrink the block
    assert pick_block_rows(131072, 4096, 4) <= 512
    assert 131072 % pick_block_rows(131072, 768, 4) == 0
    assert pick_block_rows(128, 48, 4) == 128
    assert pick_block_rows(96, 48, 4) == 96 or 96 % pick_block_rows(96, 48, 4) == 0


def test_engine_pallas_impl_matches_scan(rng):
    """End-to-end: engine with impl='pallas' (interpret on CPU mesh)."""
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    for shards in (1, 8):
        cfg = CollectionConfig(name="t", dim=32, metric="cosine",
                               segment_rows=128, shards=shards)
        eng = DeviceEngine(cfg)
        n = 700
        vecs = rng.standard_normal((n, 32)).astype(np.float32)
        eng.ensure_capacity(n)
        eng.write(np.arange(n, dtype=np.uint64), vecs)
        eng.erase(np.arange(0, n, 9))
        q = rng.standard_normal((4, 32)).astype(np.float32)
        v_s, i_s = eng.search(q, 10, impl="scan")
        v_p, i_p = eng.search(q, 10, impl="pallas")
        np.testing.assert_array_equal(i_s, i_p)


def test_fused_topk_pads_nondivisible_rows(rng):
    """Direct fused_topk callers with n not divisible by any block choice
    must still scan every row (the tail used to be silently dropped)."""
    import jax.numpy as jnp
    from vrod_tpu.ops.pallas_topk import fused_topk
    n, d = 1001, 32
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    aux = jnp.ones((n,), jnp.float32)
    valid = jnp.ones((n,), bool)
    q = x[n - 1:n]  # the LAST row: lives in the would-be-truncated tail
    vals, idx = fused_topk(x, aux, valid, q, k=1, metric="dot",
                           interpret=True)
    assert int(idx[0, 0]) == n - 1


def test_theta0_warm_start_is_exact(rng):
    """A sampled sound floor must not change results: indices with and
    without theta0 are identical (including ties and deletions)."""
    import jax.numpy as jnp
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops.pallas_topk import fused_topk
    from jax import lax
    n, d, b, k = 4096, 32, 16, 24
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    aux = jnp.ones((n,), jnp.float32)
    valid = jnp.asarray(rng.random(n) > 0.1)
    q = jnp.asarray(rng.standard_normal((b, d)), dtype=jnp.float32)
    t0 = D.sampled_threshold(x, aux, valid, q, k=k, metric="dot",
                             precision=lax.Precision.HIGHEST,
                             max_fraction=4)
    base_v, base_i = fused_topk(x, aux, valid, q, k=k, metric="dot",
                                interpret=True)
    warm_v, warm_i = fused_topk(x, aux, valid, q, k=k, metric="dot",
                                interpret=True, theta0=t0)
    assert (warm_i == base_i).all()
    assert (warm_v == base_v).all()


def test_sampled_threshold_soundness_randomized(rng):
    """theta0 <= the true k-th best score for every query (the soundness
    contract), across metrics and deletion patterns."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from vrod_tpu.ops import distances as D
    for metric in ("dot", "cosine", "l2"):
        n, d, b, k = 2048, 16, 8, 17
        x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
        if metric == "cosine":
            aux = 1.0 / jnp.linalg.norm(x, axis=1)
        elif metric == "l2":
            aux = jnp.sum(x * x, axis=1)
        else:
            aux = jnp.zeros((n,), jnp.float32)
        valid = jnp.asarray(rng.random(n) > 0.3)
        qf = rng.standard_normal((b, d)).astype(np.float32)
        q = jnp.asarray(qf / np.linalg.norm(qf, axis=1, keepdims=True)
                        if metric == "cosine" else qf)
        prec = lax.Precision.HIGHEST
        t0 = np.asarray(D.sampled_threshold(
            x, aux, valid, q, k=k, metric=metric, precision=prec,
            max_fraction=1))
        s = np.asarray(D.block_scores(q, x, aux, valid, metric=metric,
                                      precision=prec))
        kth = np.sort(s, axis=1)[:, -k]
        assert (t0[:, 0] <= kth + 1e-7).all(), (metric, t0[:, 0], kth)


def test_kth_largest_count_exact(rng):
    """kth_largest_count returns the EXACT per-row k-th largest (numpy
    sort oracle) across ties, negatives, -inf, denormals, and the k=1 /
    k=nsub edges — it is the tightest floor threshold_from_submax can
    produce, so exactness here is the whole point."""
    import jax.numpy as jnp
    import numpy as np
    from vrod_tpu.ops import distances as D
    cases = []
    for nsub, k in [(128, 1), (128, 128), (256, 17), (1024, 100)]:
        cases.append((rng.standard_normal((8, nsub)).astype(np.float32), k))
    # Heavy ties (quantized values) + -inf holes + denormal magnitudes.
    tied = np.round(rng.standard_normal((8, 256)) * 2).astype(np.float32)
    tied[rng.random(tied.shape) < 0.2] = -np.inf
    cases.append((tied, 9))
    tiny = (rng.standard_normal((4, 128)) * 1e-42).astype(np.float32)
    cases.append((tiny, 5))
    allneg = -np.abs(rng.standard_normal((4, 128))).astype(np.float32)
    cases.append((allneg, 31))
    for sub, k in cases:
        got = np.asarray(D.kth_largest_count(jnp.asarray(sub), k))[:, 0]
        want = np.sort(sub, axis=1)[:, -k]
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_threshold_from_submax_count_vs_topk(rng):
    """method='count' agrees with the exact top_k method bit-for-bit
    (same k-th statistic in, same margin formula out)."""
    import jax.numpy as jnp
    import numpy as np
    from vrod_tpu.ops import distances as D
    sub = jnp.asarray(rng.standard_normal((16, 512)), dtype=jnp.float32)
    k = 33
    a = np.asarray(D.threshold_from_submax(sub, k, approx=False,
                                           method="topk"))
    b = np.asarray(D.threshold_from_submax(sub, k, method="count"))
    np.testing.assert_array_equal(a, b)
    # And the disabled-floor edge: fewer sub-maxima than k.
    small = jnp.asarray(rng.standard_normal((4, 8)), dtype=jnp.float32)
    out = np.asarray(D.threshold_from_submax(small, 9, method="count"))
    assert np.isneginf(out).all()


def test_engine_count_floor_results_exact(rng, monkeypatch):
    """End-to-end: the engine with VROD_THETA0_METHOD=count (exact
    counting k-th statistic instead of approx_max_k) matches the scan
    oracle with the floor gate ACTUALLY OPEN. Gate arithmetic mirrors
    test_int8_small_k_floor_engine_bit_identical: int8 cosine, rows
    32768, k=16 -> k_scan 28, blk forced to 2048 -> n_sample 6144,
    nsub 384 >= 2*28, rows >= 4*6144 — OPEN; a spy proves the count
    method really computed the threshold (no silent fallback). dim=48
    keeps this test's TRACE unique: since "count" became the DEFAULT
    method (round 5), a dim-16 k-16 program is already traced
    (spy-free) by earlier tests sharing the lru_cached _search_fn, and
    the spy is only consulted at trace time."""
    import numpy as np
    from vrod_tpu.config import CollectionConfig
    from vrod_tpu.engine import DeviceEngine
    from vrod_tpu.ops import distances as D
    monkeypatch.setenv("VROD_THETA0_METHOD", "count")
    monkeypatch.setenv("VROD_THETA0_BLK", "2048")
    seen = {}
    orig = D.kth_largest_count

    def spy(sub, k):
        seen["k"] = k
        return orig(sub, k)

    monkeypatch.setattr(D, "kth_largest_count", spy)
    cfg = CollectionConfig(name="cntf", dim=48, metric="cosine",
                           dtype="int8", segment_rows=32768, shards=1)
    eng = DeviceEngine(cfg)
    n = 32768
    vecs = rng.standard_normal((n, 48)).astype(np.float32)
    eng.ensure_capacity(n)
    eng.write(np.arange(n, dtype=np.uint64), vecs)
    eng.erase(np.arange(0, n, 11))
    q = rng.standard_normal((8, 48)).astype(np.float32)
    vp, ip = eng.search(q, k=16, impl="pallas")
    vs, is_ = eng.search(q, k=16, impl="scan")
    np.testing.assert_array_equal(ip, is_)
    np.testing.assert_allclose(vp, vs, rtol=1e-6)
    assert seen.get("k") == 28, "count threshold never ran (gate closed?)"
    # Typos must be loud, not silently pick some method (perf lever).
    monkeypatch.setenv("VROD_THETA0_METHOD", "Count")
    with pytest.raises(ValueError, match="VROD_THETA0_METHOD"):
        eng.search(q, k=16, impl="pallas")


def test_sampled_submax_matches_reference(rng):
    """The fused group-max pre-pass equals the jnp reference (strided
    groups of block_rows//128 rows, 128 maxima per block)."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops.pallas_topk import sampled_submax
    n, d, b, blk = 1024, 32, 8, 256
    x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
    aux = jnp.ones((n,), jnp.float32)
    valid = jnp.asarray(rng.random(n) > 0.2)
    q = jnp.asarray(rng.standard_normal((b, d)), dtype=jnp.float32)
    sub = sampled_submax(x, aux, valid, q, metric="dot", block_rows=blk,
                         precision_name="exact", interpret=True)
    s = np.asarray(D.block_scores(q, x, aux, valid, metric="dot",
                                  precision=lax.Precision.HIGHEST))
    nblocks = n // blk
    ref = np.full((b, nblocks * 128), -np.inf, np.float32)
    for j in range(nblocks):
        blk_s = s[:, j * blk:(j + 1) * blk].reshape(b, blk // 128, 128)
        ref[:, j * 128:(j + 1) * 128] = blk_s.max(axis=1)
    np.testing.assert_array_equal(np.asarray(sub), ref)


@pytest.mark.parametrize("metric", ["dot", "l2"])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_dot_l2_floor_sound_and_exact(rng, metric, dtype):
    """The engine's dot/l2 floor recipe (sampled_submax +
    accumulation_margin + threshold_from_submax): theta0 <= the true k-th
    best score, and warm-started results are bit-identical — including
    adversarial norm spreads (some rows 100x larger)."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops.pallas_topk import fused_topk, sampled_submax

    n, d, b, k = 4096, 32, 8, 64
    xf = rng.standard_normal((n, d)).astype(np.float32)
    xf[rng.integers(0, n, 64)] *= 100.0  # adversarial magnitude spread
    rows, aux = D.prepare_rows(jnp.asarray(xf), metric=metric, dtype=dtype)
    valid = jnp.asarray(rng.random(n) > 0.2)
    q = jnp.asarray(rng.standard_normal((b, d)) * 3, dtype=jnp.float32)

    n_sample = 2048
    sub = sampled_submax(rows[:n_sample], aux[:n_sample], valid[:n_sample],
                         q, metric=metric, precision_name="fast",
                         interpret=True)
    extra = D.accumulation_margin(q, aux, valid, metric=metric, dim=d)
    t0 = D.threshold_from_submax(sub, k, approx=False, extra=extra)

    # Soundness: floor <= exact k-th best score of the FULL set.
    s = np.asarray(D.block_scores(q, rows, aux, valid, metric=metric,
                                  precision=lax.Precision.HIGHEST))
    kth = np.sort(s, axis=1)[:, -k]
    assert (np.asarray(t0)[:, 0] <= kth + 1e-7).all(), (metric, dtype)

    # Bit-identical warm start at the production fast precision.
    base_v, base_i = fused_topk(rows, aux, valid, q, k=k, metric=metric,
                                precision_name="fast", interpret=True)
    warm_v, warm_i = fused_topk(rows, aux, valid, q, k=k, metric=metric,
                                precision_name="fast", interpret=True,
                                theta0=t0)
    assert (warm_i == base_i).all()
    assert (warm_v == base_v).all()


@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_int8_floor_sound_and_exact(rng, metric):
    """int8 dot/l2 sampled floor: the integer dot is order-independent and
    the epilogue elementwise, so the pre-pass scores are bit-identical to
    the main kernel's — the floor is sound with NO accumulation margin
    (extra=None, the engine's recipe). Warm-started results must be
    bit-identical; the floor must lower-bound the true k-th best score."""
    import jax.numpy as jnp
    import numpy as np
    from vrod_tpu.ops import distances as D
    from vrod_tpu.ops.pallas_topk import fused_topk, sampled_submax

    n, d, b, k = 4096, 32, 8, 64
    xf = rng.standard_normal((n, d)).astype(np.float32)
    xf[rng.integers(0, n, 64)] *= 100.0  # adversarial magnitude spread
    rows, aux = D.prepare_rows(jnp.asarray(xf), metric=metric, dtype="int8")
    valid = jnp.asarray(rng.random(n) > 0.2)
    qf = jnp.asarray(rng.standard_normal((b, d)) * 3, dtype=jnp.float32)
    q8, qs = D.prepare_queries(qf, metric=metric, quantize=True,
                               return_scale=True)
    if metric == "l2":
        norms = (aux * aux) * jnp.sum(rows.astype(jnp.float32) ** 2, axis=1)
        extras = dict(row_bias=-norms, q_scale=qs.reshape(-1))
        q_used = q8
    else:
        extras = {}
        q_used = q8  # dot drops the per-query scale (rank-invariant)

    n_sample = 2048
    sub = sampled_submax(
        rows[:n_sample], aux[:n_sample], valid[:n_sample], q_used,
        metric=metric, precision_name="fast", interpret=True,
        **{kk: (v[:n_sample] if kk == "row_bias" else v)
           for kk, v in extras.items()})
    t0 = D.threshold_from_submax(sub, k, approx=False, extra=None)

    # Soundness vs the kernel's own score space, computed in f64: dot
    # drops the query scale, l2 keeps it (2*sq*sx*g - |x_hat|^2).
    x64 = np.asarray(rows, np.float64)
    a64 = np.asarray(aux, np.float64)
    g = np.asarray(q8, np.float64) @ x64.T
    if metric == "l2":
        s = 2.0 * np.asarray(qs, np.float64) * (g * a64[None, :]) \
            - (a64 * a64 * (x64 ** 2).sum(1))[None, :]
    else:
        s = g * a64[None, :]
    s[:, ~np.asarray(valid)] = -np.inf
    kth = np.sort(s, axis=1)[:, -k]
    assert (np.asarray(t0)[:, 0] <= kth + 1e-5).all(), metric

    base_v, base_i = fused_topk(rows, aux, valid, q_used, k=k, metric=metric,
                                precision_name="fast", interpret=True,
                                **extras)
    warm_v, warm_i = fused_topk(rows, aux, valid, q_used, k=k, metric=metric,
                                precision_name="fast", interpret=True,
                                theta0=t0, **extras)
    assert (warm_i == base_i).all()
    assert (warm_v == base_v).all()


@pytest.mark.parametrize("metric,dtype,dim,want_blk", [
    # bf16 at small dim: 16384-block pre-pass fits VMEM and the 32k-row
    # sample rounds to two whole blocks.
    ("l2", "bfloat16", 8, 16384),
    ("dot", "bfloat16", 8, 16384),
    # int8 top-16 (k_scan 28): the rows/32 sample (8192) rounds to zero
    # 16384-blocks, so auto falls back to 8192.
    ("cosine", "int8", 8, 8192),
    # f32 at dim 768: the 16384-block tile is 48 MB > the pre-pass VMEM
    # budget — auto must select 8192 directly, not let sampled_submax
    # halve AFTER the sample was rounded to 16384-multiples.
    ("l2", "float32", 768, 8192),
    # f32 at dim 1024: even 8192 busts the budget (32 MB); both
    # candidates shrink to 4096 rather than closing the gate.
    ("cosine", "float32", 1024, 4096),
])
def test_engine_floor_gate_wiring_at_scale(metric, dtype, dim, want_blk,
                                           monkeypatch):
    """The engine's floor glue at production scale, checked at TRACE time
    (running the interpreted-Pallas program on CPU at these row counts
    takes >10 min, and the f32 cases would allocate ~1 GB, so the program
    is lowered from abstract avals, never executed): the gate must
    actually OPEN, the pre-pass must receive the right query (f32 for
    bf16/f32, the engine's prepared scan query for int8), the
    auto-selected block must respect sampled_submax's VMEM budget, and
    unnormalized float metrics must carry the accumulation_margin
    `extra` — a silent wiring regression here would only surface as a
    hardware recall miss otherwise."""
    from vrod_tpu.engine import _search_fn, _mesh_key, _pick_block_rows
    from vrod_tpu.parallel.mesh import make_mesh
    from vrod_tpu.ops import pallas_topk, distances as D

    seen = {}
    orig_submax = pallas_topk.sampled_submax
    orig_margin = D.accumulation_margin

    def spy_submax(x, aux, valid, q, **kw):
        seen["n_sample"] = int(x.shape[0])
        seen["q_dtype"] = str(q.dtype)
        seen["blk"] = kw.get("block_rows")
        return orig_submax(x, aux, valid, q, **kw)

    def spy_margin(q, aux, valid, **kw):
        seen["extra"] = True
        return orig_margin(q, aux, valid, **kw)

    monkeypatch.setattr(pallas_topk, "sampled_submax", spy_submax)
    monkeypatch.setattr(D, "accumulation_margin", spy_margin)

    n = 262144
    mesh = make_mesh(1)  # strong ref: _MESHES holds meshes weakly
    k_out = 16 if dtype == "int8" else 64
    margin = 12 if dtype == "int8" else 8
    k_scan = k_out + margin
    block_rows = _pick_block_rows(n, n)
    # Mirror collection-path defaults exactly (engine.py _search_fn call):
    # theta0_blk=0 selects the pre-pass block automatically and
    # theta0_mink=24 keeps the floor on for int8 top-16 (k_scan 28).
    fn = _search_fn(_mesh_key(mesh), 8, k_out, k_scan, metric,
                    "fast", dtype, n, block_rows,
                    1, True, "pallas",
                    True, 1e-3, 8, "approx", 0, 24)
    aval = jax.ShapeDtypeStruct
    fn.lower(aval((n, dim), jnp.dtype(dtype)), aval((n,), jnp.float32),
             aval((n,), jnp.bool_),
             aval((8, dim), jnp.float32))  # trace only — spies fire here

    assert seen.get("n_sample", 0) > 0, "floor gate never opened"
    assert seen["blk"] == want_blk
    if dtype == "int8":
        # int8 cosine scans with the quantized query, margin-free
        assert seen["q_dtype"] == "int8"
        assert "extra" not in seen
    else:
        # bf16/f32 scan with the f32 query; dot/l2 must carry the
        # Cauchy-Schwarz accumulation margin, cosine must not
        assert seen["q_dtype"] == "float32"
        assert seen.get("extra", False) == (metric != "cosine"), \
            "accumulation_margin wiring wrong"


def test_dot_aux_lane_stores_norm2(rng):
    """prepare_rows for dot now fills aux with |x|^2 (the floor's norm
    bound); the dot epilogue must keep ignoring it."""
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from vrod_tpu.ops import distances as D
    x = rng.standard_normal((16, 8)).astype(np.float32)
    rows, aux = D.prepare_rows(jnp.asarray(x), metric="dot", dtype="float32")
    np.testing.assert_allclose(np.asarray(aux), (x ** 2).sum(1), rtol=1e-6)
    q = jnp.asarray(x[:2])
    s = D.block_scores(q, rows, aux, jnp.ones(16, bool), metric="dot",
                       precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(s), x[:2] @ x.T, rtol=1e-5)


def test_legacy_dot_snapshot_aux_recomputed(tmp_path, rng):
    """Round <= 2 dot snapshots persisted aux = 0; restore must rebuild
    |x|^2 so the sampled floor's norm bound stays sound."""
    import numpy as np
    from vrod_tpu.collection import Collection
    from vrod_tpu.config import CollectionConfig

    cfg = CollectionConfig(name="ld", dim=8, metric="dot", segment_rows=64)
    col = Collection.create(tmp_path / "ld", cfg)
    vecs = rng.standard_normal((10, 8)).astype(np.float32)
    col.bulk_insert(vecs)
    col.snapshot()
    col.close()
    # Rewrite the snapshot aux file with zeros (legacy format).
    import json
    snap = tmp_path / "ld" / "snapshot"
    from vrod_tpu import snapshot as snapio
    w = snapio.RawStreamWriter(snap / "aux.bin")
    w.write_rows(np.zeros(10, np.float32))
    crc = w.close()
    meta = json.loads((snap / "meta.json").read_text())
    meta["crc32"]["aux.bin"] = crc
    # Legacy (round <= 2) metas predate the meta_crc self-checksum;
    # dropping it exercises the accepted-legacy restore path too.
    meta.pop("meta_crc", None)
    (snap / "meta.json").write_text(json.dumps(meta))

    col2 = Collection.load(tmp_path / "ld")
    aux = np.asarray(col2.engine.aux)[:10]
    np.testing.assert_allclose(aux, (vecs ** 2).sum(1), rtol=1e-5)
    col2.close()
