"""Fused Pallas TPU kernel: blocked distance matmul + on-chip exact top-k.

The TPU-native core of SEARCHSIMILAR (reference stub:
``/root/reference/src/command/types.rs:121-132``). One pass over the
collection: each grid step loads a row block HBM->VMEM (manually
double-buffered DMA by default), computes the query-tile x block score
matrix on the MXU, applies the metric epilogue + validity mask on the VPU,
and merges the block into a running top-k carried in VMEM across steps. The
(B, N) score matrix never exists — unlike the lax.scan path, nothing is
spilled to HBM between blocks.

Exact top-k without sorting OR score mutation: the carry is kept sorted
descending; per block, candidates are walked in (value desc, col asc) order
by a carry of (current value m, last extracted col a). Each extraction is
two lane-wise read passes over the pristine score block — a min-where for
the candidate column and a masked max for the next value — with ties broken
by the ``col > a`` constraint, matching stable lax.top_k exactly. The score
block is never written back, so non-contributing blocks (the overwhelming
majority once the carry warms up) cost one max pass beyond the matmul, and
no VMEM scratch is needed for scores at all. Expected extractions across
the whole scan: ~k * (1 + ln nblocks) per query; worst case is still
exact, just slower.

Since round 5 the extraction is GATED: the carry lives in VMEM scratch
refs and the whole while-loop construct sits behind ``pl.when`` on the
loop's own first cond, so non-contributing blocks skip the Mosaic while
ENTRY too, not just its iterations (hardware A/B, kexp18: int8 -13% at
k_scan 24 / -18% at k_scan 112; bit-identical results by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distances import PRECISIONS, unpack_int4

# Mosaic's dot lowering supports DEFAULT and HIGHEST only ("high"'s 3-pass
# bf16 is an XLA:TPU notion): in the Pallas kernels, "high" rounds UP to
# HIGHEST — conservative (never less precise than asked) and compilable.
_PRECISIONS = dict(PRECISIONS, high=PRECISIONS["exact"])

NEG_INF = float("-inf")
_INT_MAX = jnp.iinfo(jnp.int32).max
_COL_SENTINEL = -(2 ** 30)  # "no column extracted yet at this value"


def _insert_one(cv, ci, m, am, has, kiota):
    """Insert candidate (m, am) (B, 1) into the sorted carry after any
    equal-valued entries (>=, not >): ties keep ascending-index order,
    matching the stable lax.top_k of the scan path."""
    pos = jnp.sum((cv >= m).astype(jnp.int32), axis=1, keepdims=True)
    shift_v = pltpu.roll(cv, 1, 1)
    shift_i = pltpu.roll(ci, 1, 1)
    ins_v = jnp.where(kiota < pos, cv, jnp.where(kiota == pos, m, shift_v))
    ins_i = jnp.where(kiota < pos, ci, jnp.where(kiota == pos, am, shift_i))
    return jnp.where(has, ins_v, cv), jnp.where(has, ins_i, ci)


def _extract_block(s, col, cv, ci, k, kiota, theta0):
    """Merge score block ``s`` (B, BLK; global column ids ``col``) into the
    sorted carry (cv, ci) — the zero-store extraction described in the
    module docstring.

    ``theta0`` (B, 1) is a SOUND per-query extraction floor (provably <=
    the true k-th best score, e.g. from a sampled pre-pass): candidates at
    or below it can never enter the final top-k carry, so skipping them is
    exact. -inf disables the floor (the classic cold-start behavior)."""
    m0 = jnp.max(s, axis=1, keepdims=True)
    a0 = jnp.full(m0.shape, _COL_SENTINEL, jnp.int32)

    def cond(state):
        m, a, cv, ci = state
        return jnp.any(m > jnp.maximum(cv[:, k - 1:k], theta0))

    def body(state):
        m, a, cv, ci = state
        theta = jnp.maximum(cv[:, k - 1:k], theta0)
        # Candidate column: lowest col holding the current value, past any
        # already-extracted tie.
        am = jnp.min(jnp.where((s == m) & (col > a), col, _INT_MAX),
                     axis=1, keepdims=True)
        has = m > theta
        cv, ci = _insert_one(cv, ci, m, am, has, kiota)
        # Next value: strictly below m, or an unextracted tie of m.
        nxt = (s < m) | ((s == m) & (col > am))
        m_next = jnp.max(jnp.where(nxt, s, NEG_INF), axis=1, keepdims=True)
        a_next = jnp.where(m_next == m, am,
                           jnp.full_like(am, _COL_SENTINEL))
        return m_next, a_next, cv, ci

    _, _, cv, ci = lax.while_loop(cond, body, (m0, a0, cv, ci))
    return cv, ci


def _extract_block_gated(s, col, cv_ref, ci_ref, k, kiota, theta0):
    """Ref-carried variant of ``_extract_block`` with the whole while-loop
    construct gated behind ``pl.when``: blocks that cannot contribute (the
    overwhelming majority once the carry warms up — and with a sampled
    floor, from block 0) skip the Mosaic while-loop ENTRY entirely instead
    of paying one cond evaluation + loop machinery per block. The predicate
    is exactly the loop's first cond, so results are bit-identical
    (hardware A/B, experiments/kexp18.py: int8 -13% at k_scan 24 / -18% at
    k_scan 112 vs the value-carried form; bf16 -12%/-16%).

    The carry must live in VMEM refs because ``pl.when`` regions have no
    value outputs; ``s`` is still never written (zero-store extraction)."""
    m0 = jnp.max(s, axis=1, keepdims=True)
    a0 = jnp.full(m0.shape, _COL_SENTINEL, jnp.int32)
    contributes = jnp.any(m0 > jnp.maximum(cv_ref[:, k - 1:k], theta0))

    @pl.when(contributes)
    def _():
        def cond(state):
            m, a = state
            return jnp.any(m > jnp.maximum(cv_ref[:, k - 1:k], theta0))

        def body(state):
            m, a = state
            cv, ci = cv_ref[:], ci_ref[:]
            theta = jnp.maximum(cv[:, k - 1:k], theta0)
            am = jnp.min(jnp.where((s == m) & (col > a), col, _INT_MAX),
                         axis=1, keepdims=True)
            has = m > theta
            cv, ci = _insert_one(cv, ci, m, am, has, kiota)
            cv_ref[:] = cv
            ci_ref[:] = ci
            nxt = (s < m) | ((s == m) & (col > am))
            m_next = jnp.max(jnp.where(nxt, s, NEG_INF),
                             axis=1, keepdims=True)
            a_next = jnp.where(m_next == m, am,
                               jnp.full_like(am, _COL_SENTINEL))
            return m_next, a_next

        lax.while_loop(cond, body, (m0, a0))


def _epilogue(g, aux, mask, metric, quantized=False, qs=None):
    if quantized:
        if metric == "l2":
            # int8 + l2: the cross term 2*<x_hat, q_hat> = (2*sq)*sx*g
            # needs the per-query quant scale sq (``qs`` carries 2*sq,
            # (B, 1)) — unlike cosine/dot it is NOT rank-invariant, because
            # it multiplies only one term of 2*q.x_hat - |x_hat|^2. The
            # -|x_hat|^2 term rides the mask stream (see ``fused_topk``'s
            # ``row_bias``), so this costs no extra HBM bandwidth. g is an
            # exact integer (<= 127*127*1040 < 2^24, exact in f32).
            s = (g.astype(jnp.float32) * aux[None, :]) * qs
        else:
            # int8 scan: g is the integer dot (exact); aux is the per-row
            # dequant scale. Per-query scale factors are positive and
            # dropped (rank-invariant); the rescore restores true values.
            s = g.astype(jnp.float32) * aux[None, :]
    elif metric == "cosine":
        s = g * aux[None, :]
    elif metric == "l2":
        s = 2.0 * g - aux[None, :]
    else:
        s = g
    return s + mask[None, :]  # -inf on deleted / never-used slots


def _block_dot(q, x_blk, precision, packed=False):
    """Query-tile x row-block scores on the MXU; int8 collections use the
    integer MXU path (s8 x s8 -> s32).

    ``packed`` (int4 collections): ``x_blk`` is (BLK, D/2) packed bytes
    holding dims [0, D/2) in the low nibbles and [D/2, D) in the high
    nibbles (``distances.pack_int4``). The nibbles sign-extend to int8 on
    the VPU (int32 shifts — Mosaic lowers sub-word lane shifts poorly)
    and score as TWO half-dim s8 x s8 MXU dots against the matching query
    halves — the same total MAC count as the unpacked dot, at half the
    HBM stream. |g| <= 127 * 7 * D stays exact in int32 and f32 for any
    practical dim."""
    if packed:
        if q.dtype != jnp.int8:
            raise TypeError(
                f"int4 rows require an int8-quantized query, got {q.dtype}")
        lo, hi = unpack_int4(x_blk, jnp.int8)
        d2 = x_blk.shape[1]
        dn = (((1,), (1,)), ((), ()))
        return lax.dot_general(
            q[:, :d2], lo, dimension_numbers=dn,
            preferred_element_type=jnp.int32) + lax.dot_general(
            q[:, d2:], hi, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
    if x_blk.dtype == jnp.int8:
        if q.dtype != jnp.int8:
            # A float query truncated via astype would score garbage with
            # valid-looking shapes — exactness is a contract, so refuse:
            # callers must quantize the query (engine.quantize_q) first.
            raise TypeError(
                f"int8 rows require an int8-quantized query, got {q.dtype}")
        return lax.dot_general(
            q, x_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    return lax.dot_general(
        q.astype(x_blk.dtype), x_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)


def _kernel(offset_ref, q_ref, t0_ref, *rest, metric, k, block_rows,
            precision, has_qs=False, gated=True, packed=False):
    # ``has_qs`` (static, int8+l2 only) inserts a (B, 1) per-query quant
    # scale input after theta0; other configs compile the identical
    # argument list (and program) they always had.
    if has_qs:
        qs_ref, x_ref, aux_ref, mask_ref, ov_ref, oi_ref, cv_ref, ci_ref \
            = rest
    else:
        x_ref, aux_ref, mask_ref, ov_ref, oi_ref, cv_ref, ci_ref = rest
        qs_ref = None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        cv_ref[:] = jnp.full(cv_ref.shape, NEG_INF, dtype=jnp.float32)
        ci_ref[:] = jnp.full(ci_ref.shape, -1, dtype=jnp.int32)

    g = _block_dot(q_ref[:], x_ref[:], precision, packed=packed)
    s = _epilogue(g, aux_ref[0, :], mask_ref[0, :], metric,
                  quantized=x_ref.dtype == jnp.int8,
                  qs=qs_ref[:] if has_qs else None)

    base = j * block_rows + offset_ref[0]
    col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    kiota = lax.broadcasted_iota(jnp.int32, cv_ref.shape, 1)

    if gated:
        _extract_block_gated(s, col, cv_ref, ci_ref, k, kiota, t0_ref[:])
    else:  # VROD_GATED_EXTRACT=0: the pre-r5 value-carried form (A/B leg)
        cv, ci = _extract_block(s, col, cv_ref[:], ci_ref[:], k, kiota,
                                t0_ref[:])
        cv_ref[:] = cv
        ci_ref[:] = ci

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ov_ref[:] = cv_ref[:]
        oi_ref[:] = ci_ref[:]


def _kernel_db(offset_ref, q_ref, t0_ref, *rest, metric, k, block_rows,
               nblocks, precision, has_qs=False, gated=True, packed=False):
    """Manually double-buffered variant: x/aux/mask stay in HBM; the kernel
    DMAs block j+1 into the alternate VMEM slot while computing block j, so
    streaming and compute overlap regardless of how the pipeliner treats the
    data-dependent extraction loop."""
    if has_qs:  # int8+l2: (B, 1) per-query quant scale (see _kernel)
        (qs_ref, x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
         xbuf, abuf, mbuf, cv_ref, ci_ref, sems) = rest
    else:
        (x_hbm, aux_hbm, mask_hbm, ov_ref, oi_ref,
         xbuf, abuf, mbuf, cv_ref, ci_ref, sems) = rest
        qs_ref = None
    offset = offset_ref[0]
    kiota = lax.broadcasted_iota(jnp.int32, ov_ref.shape, 1)
    q = q_ref[:]
    theta0 = t0_ref[:]
    qs = qs_ref[:] if has_qs else None
    # Loop-invariant local column ids, hoisted out of the block loop; each
    # block only adds its scalar base.
    col_local = lax.broadcasted_iota(jnp.int32, (q.shape[0], block_rows), 1)

    def get_dma(slot, j):
        row0 = j * block_rows
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(row0, block_rows), :], xbuf.at[slot],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(row0, block_rows)], abuf.at[slot],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                mask_hbm.at[:, pl.ds(row0, block_rows)], mbuf.at[slot],
                sems.at[slot, 2]),
        )

    for d in get_dma(0, 0):
        d.start()

    def scored_block(j, cur):
        @pl.when(j + 1 < nblocks)
        def _():
            for d in get_dma((j + 1) % 2, j + 1):
                d.start()

        for d in get_dma(cur, j):
            d.wait()

        g = _block_dot(q, xbuf[cur], precision, packed=packed)
        s = _epilogue(g, abuf[cur][0, :], mbuf[cur][0, :], metric,
                      quantized=xbuf.dtype == jnp.int8, qs=qs)
        return s, col_local + (j * block_rows + offset)

    if gated:
        cv_ref[:] = jnp.full(cv_ref.shape, NEG_INF, dtype=jnp.float32)
        ci_ref[:] = jnp.full(ci_ref.shape, -1, dtype=jnp.int32)

        def block_loop(j, _):
            s, col = scored_block(j, j % 2)
            _extract_block_gated(s, col, cv_ref, ci_ref, k, kiota, theta0)
            return 0

        lax.fori_loop(0, nblocks, block_loop, 0)
        ov_ref[:] = cv_ref[:]
        oi_ref[:] = ci_ref[:]
    else:  # VROD_GATED_EXTRACT=0: the pre-r5 value-carried form (A/B leg)
        def block_loop(j, carry):
            cv, ci = carry
            s, col = scored_block(j, j % 2)
            return _extract_block(s, col, cv, ci, k, kiota, theta0)

        init = (jnp.full(ov_ref.shape, NEG_INF, dtype=jnp.float32),
                jnp.full(oi_ref.shape, -1, dtype=jnp.int32))
        cv, ci = lax.fori_loop(0, nblocks, block_loop, init)
        ov_ref[:] = cv
        oi_ref[:] = ci


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "b_tile", "precision_name",
                     "interpret", "gated", "packed"))
def _fused_call_db(x, aux2d, mask2d, q, offset, theta0, qs, *, k, metric,
                   block_rows, b_tile, precision_name, interpret,
                   gated=True, packed=False):
    n, d = x.shape            # packed int4: d = dim/2 bytes per row
    b, dq = q.shape           # dq = full query dim (2*d when packed)
    nblocks = n // block_rows
    precision = _PRECISIONS[precision_name]
    has_qs = x.dtype == jnp.int8 and metric == "l2"

    kernel = functools.partial(
        _kernel_db, metric=metric, k=k, block_rows=block_rows,
        nblocks=nblocks, precision=precision, has_qs=has_qs, gated=gated,
        packed=packed)

    qs_spec = [pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)] if has_qs else []
    qs_arg = (qs,) if has_qs else ()
    vals, idx = pl.pallas_call(
        kernel,
        grid=(b // b_tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # offset
            pl.BlockSpec((b_tile, dq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # q
            pl.BlockSpec((b_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # theta0
            *qs_spec,                                 # 2*sq (int8+l2 only)
            pl.BlockSpec(memory_space=pl.ANY),                    # x (HBM)
            pl.BlockSpec(memory_space=pl.ANY),                    # aux
            pl.BlockSpec(memory_space=pl.ANY),                    # mask
        ],
        out_specs=(
            pl.BlockSpec((b_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, d), x.dtype),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            # Top-k carry lives in refs: the gated extraction's pl.when
            # region has no value outputs (see _extract_block_gated).
            pltpu.VMEM((b_tile, k), jnp.float32),
            pltpu.VMEM((b_tile, k), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dq,
            bytes_accessed=n * d * x.dtype.itemsize
            + b * dq * q.dtype.itemsize + n * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offset, q, theta0, *qs_arg, x, aux2d, mask2d)
    return vals, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "b_tile", "precision_name",
                     "interpret", "gated", "packed"))
def _fused_call(x, aux2d, mask2d, q, offset, theta0, qs, *, k, metric,
                block_rows, b_tile, precision_name, interpret, gated=True,
                packed=False):
    n, d = x.shape            # packed int4: d = dim/2 bytes per row
    b, dq = q.shape           # dq = full query dim (2*d when packed)
    nblocks = n // block_rows
    precision = _PRECISIONS[precision_name]
    has_qs = x.dtype == jnp.int8 and metric == "l2"

    grid = (b // b_tile, nblocks)
    kernel = functools.partial(
        _kernel, metric=metric, k=k, block_rows=block_rows,
        precision=precision, has_qs=has_qs, gated=gated, packed=packed)

    qs_spec = [pl.BlockSpec((b_tile, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)] if has_qs else []
    qs_arg = (qs,) if has_qs else ()
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # offset
            pl.BlockSpec((b_tile, dq), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),                   # q
            pl.BlockSpec((b_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),                   # theta0
            *qs_spec,                                 # 2*sq (int8+l2 only)
            pl.BlockSpec((block_rows, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                   # aux
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),                   # mask
        ],
        out_specs=(
            pl.BlockSpec((b_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_tile, k), jnp.float32),
            pltpu.VMEM((b_tile, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dq,
            bytes_accessed=n * d * x.dtype.itemsize
            + b * dq * q.dtype.itemsize + n * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # Query tiles are independent; row blocks carry the running
            # top-k and must run in order.
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(offset, q, theta0, *qs_arg, x, aux2d, mask2d)
    return vals, idx


def _submax_kernel(q_ref, *rest, metric, precision, has_qs=False,
                   packed=False):
    if has_qs:  # int8+l2: (B, 1) per-query quant scale (see _kernel)
        qs_ref, x_ref, aux_ref, mask_ref, o_ref = rest
    else:
        x_ref, aux_ref, mask_ref, o_ref = rest
        qs_ref = None
    g = _block_dot(q_ref[:], x_ref[:], precision, packed=packed)
    s = _epilogue(g, aux_ref[0, :], mask_ref[0, :], metric,
                  quantized=x_ref.dtype == jnp.int8,
                  qs=qs_ref[:] if has_qs else None)
    b, blk = s.shape
    # 128 group-maxima per block, groups STRIDED by 128 lanes (lane t of
    # the output is the max over rows {t, t+128, ...} of the block): the
    # minor 128-lane dim survives the reshape, which Mosaic lowers cleanly
    # (a minor-dim split does not). Any partition of rows into groups
    # yields sound element maxima — stride is as good as consecutive.
    o_ref[:] = jnp.max(s.reshape(b, blk // 128, 128), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "block_rows", "precision_name", "interpret",
                     "packed"))
def sampled_submax(x, aux, valid, q, *, metric, block_rows=2048,
                   precision_name="fast", interpret=False,
                   row_bias=None, q_scale=None, packed=False):
    """Group-maxima score pre-pass behind ``distances.sampled_threshold``:
    one streaming Pallas kernel (dot + metric epilogue + grouped max) that
    never materializes scores. Returns (B, 128 * n // block_rows) f32 —
    128 maxima per row block over strided (block_rows // 128)-row groups.
    (The XLA formulation writes the full (B, n) score matrix to HBM and
    costs more than the warm start saves — measured, kexp7.)

    ``row_bias``/``q_scale``: int8+l2 extras, same contract as
    ``fused_topk`` — the pre-pass must score with the IDENTICAL function
    as the main kernel for its sub-maxima to be true elements of the main
    kernel's score space (for int8 that agreement is bit-exact: the
    integer dot is order-independent and the epilogue is elementwise)."""
    quantized_l2 = x.dtype == jnp.int8 and metric == "l2"
    if quantized_l2 and (row_bias is None or q_scale is None):
        raise ValueError(
            "int8 + l2 sampled_submax needs row_bias=-|x_hat|^2 and "
            "q_scale, like fused_topk")
    n, d = x.shape            # packed int4: d = dim/2 bytes per row
    b, dq = q.shape           # dq = full query dim (2*d when packed)
    # VMEM guard: the auto-pipelined x tile is double-buffered, so an
    # oversized block (e.g. VROD_THETA0_BLK=32768 with bf16 at dim 768 =
    # 48 MB/tile) fails Mosaic compilation. Halving is always sound —
    # sub-maxima stay true elements under any row grouping. The engine's
    # auto-selection pre-filters by the same budget (SUBMAX_VMEM_BYTES),
    # so this only fires for explicit VROD_THETA0_BLK overrides.
    block_rows = _shrink_block(block_rows, n, d, x.dtype.itemsize,
                               SUBMAX_VMEM_BYTES, min_block=128)
    assert n % block_rows == 0 and block_rows % 128 == 0, (n, block_rows)
    nblocks = n // block_rows
    per_blk = 128
    b_tile = b if b <= 256 else 256
    while b % b_tile != 0:
        b_tile //= 2
    aux2d = aux.reshape(1, n)
    live_term = 0.0 if row_bias is None else row_bias.astype(jnp.float32)
    mask2d = jnp.where(valid, live_term, NEG_INF) \
        .astype(jnp.float32).reshape(1, n)
    if quantized_l2:
        qs2d = (2.0 * jnp.asarray(q_scale, jnp.float32)).reshape(b, 1)
        qs_arg = (qs2d,)
        qs_spec = [pl.BlockSpec((b_tile, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)]
    else:
        qs_arg, qs_spec = (), []
    kernel = functools.partial(
        _submax_kernel, metric=metric,
        precision=_PRECISIONS[precision_name], has_qs=quantized_l2,
        packed=packed)
    (out,) = (pl.pallas_call(
        kernel,
        grid=(b // b_tile, nblocks),
        in_specs=[
            pl.BlockSpec((b_tile, dq), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            *qs_spec,                                 # 2*sq (int8+l2 only)
            pl.BlockSpec((block_rows, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, per_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblocks * per_blk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * dq,
            bytes_accessed=n * d * x.dtype.itemsize
            + b * dq * q.dtype.itemsize + n * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, *qs_arg, x, aux2d, mask2d),)
    return out


# Pre-pass tile budget: 24 MB compiles at 1M x 768 bf16 (16384-row block);
# 48 MB (32768-row) fails Mosaic. The submax tile can run larger than the
# main kernel's 8 MB default because the pre-pass carries no extraction
# state alongside the double-buffered x tile.
SUBMAX_VMEM_BYTES = 24 * 1024 * 1024


def _shrink_block(block: int, n: int, d: int, itemsize: int,
                  vmem_budget: int, min_block: int) -> int:
    """Halve ``block`` until the x-tile fits the VMEM budget (tiles are
    double-buffered; floor 128, the min sublane-aligned tile) and divides
    the row count (floor ``min_block``). Shared by the main-kernel and
    submax-pre-pass block choices so the VMEM model lives once."""
    while block * d * itemsize > vmem_budget and block > 128:
        block //= 2
    while n % block != 0 and block > min_block:
        block //= 2
    return block


def pick_block_rows(n: int, d: int, itemsize: int,
                    vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Streaming block choice: 2048 rows is the measured sweet spot at
    dim 768 (fewer rows -> more while-loop instances; more rows -> wider
    extraction passes), shrunk in power-of-two steps until the x-tile fits
    the VMEM budget (x is double-buffered) and divides the row count."""
    block = _shrink_block(2048, n, d, itemsize, vmem_budget, min_block=8)
    return max(min(block, n), 8)


def fused_topk(x, aux, valid, q, *, k, metric, block_rows=None,
               index_offset=0, precision_name="high", interpret=False,
               pipeline="manual", theta0=None, row_bias=None, q_scale=None,
               packed=False):
    """Exact top-k of q (B, D) against x (N, D). Same contract as
    ``distances.blockwise_topk``: returns (values (B,k) f32, indices (B,k)
    i32 in the global slot space via ``index_offset``), empty ranks are
    (-inf, -1).

    ``theta0`` (B,) or (B, 1): optional SOUND per-query extraction floor
    (must be <= the true k-th best score; see
    ``distances.sampled_threshold``). Exactness is preserved; candidates
    below the floor just skip the extraction loop — at large k this
    removes the cold-carry over-extraction of the first blocks.

    int8 + l2 requires two extras (the engine maintains both):
    ``row_bias`` (N,) f32 = -|x_hat|^2 per row, which rides the additive
    validity-mask stream (zero extra HBM bandwidth), and ``q_scale`` (B,)
    or (B, 1) f32 = the per-query int8 quantization scale sq with
    q = round(q_f32 / sq), which scales the integer cross term in-kernel
    (it is NOT rank-invariant for l2, unlike cosine/dot).

    ``packed`` marks int4 collections: ``x`` is (N, D/2) packed bytes
    (``distances.pack_int4``), ``q`` the FULL-dim int8-quantized query;
    the kernel unpacks nibbles in VMEM and scores via two half-dim
    integer MXU dots (see ``_block_dot``). The int8+l2 extras apply to
    int4+l2 identically (|x_hat|^2 from the unpacked rows)."""
    quantized_l2 = x.dtype == jnp.int8 and metric == "l2"
    if quantized_l2 and (row_bias is None or q_scale is None):
        raise ValueError(
            "int8 + l2 fused kernel needs row_bias=-|x_hat|^2 (N,) and "
            "q_scale (B,) — the engine maintains both; direct callers "
            "must supply them (or use the scan path)")
    n, d = x.shape
    b = q.shape[0]
    if block_rows is None or n % block_rows != 0 or (
            block_rows * d * x.dtype.itemsize > 8 * 1024 * 1024) or (
            block_rows > 2048):
        # Choose the streaming block ourselves when the caller's hint does
        # not divide the row count or exceeds the VMEM double-buffer budget.
        block_rows = pick_block_rows(n, d, x.dtype.itemsize)
    if n % block_rows != 0:
        # No power-of-two block divides n (engine callers always pass
        # segment multiples; direct callers may not): pad with masked rows
        # rather than silently truncating the tail out of the scan.
        pad = block_rows - n % block_rows
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])
        aux = jnp.concatenate([aux, jnp.zeros((pad,), aux.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)])
        if row_bias is not None:
            row_bias = jnp.concatenate(
                [row_bias, jnp.zeros((pad,), row_bias.dtype)])
        n += pad
    b_tile = b if b <= 256 else 256
    while b % b_tile != 0:
        b_tile //= 2
    aux2d = aux.reshape(1, n)
    # The mask stream is an ADDITIVE per-row score term: -inf on dead
    # slots, else row_bias (0 everywhere except int8+l2's -|x_hat|^2).
    live_term = 0.0 if row_bias is None else row_bias.astype(jnp.float32)
    mask2d = jnp.where(valid, live_term, NEG_INF) \
        .astype(jnp.float32).reshape(1, n)
    offset = jnp.asarray(index_offset, dtype=jnp.int32).reshape(1)
    if theta0 is None:
        t0 = jnp.full((b, 1), NEG_INF, dtype=jnp.float32)
    else:
        t0 = jnp.asarray(theta0, dtype=jnp.float32).reshape(b, 1)
    if quantized_l2:
        # The kernel's cross term is (2*sq) * sx * g — pre-double here so
        # the hot loop pays one multiply, not two.
        qs = (2.0 * jnp.asarray(q_scale, dtype=jnp.float32)).reshape(b, 1)
    else:
        qs = jnp.ones((b, 1), dtype=jnp.float32)
    # The manual double-buffered variant overlaps the HBM stream with
    # compute; interpret mode lacks real DMA timing, so tests exercise both.
    # Manual HBM->VMEM DMA slices must be 128-lane aligned; odd dims fall
    # back to the auto-pipelined grid (which pads blocks transparently).
    if pipeline == "manual" and (d % 128 != 0 or block_rows % 128 != 0):
        pipeline = "auto"
    # Gated extraction kill switch (trace-time static; VROD_GATED_EXTRACT=0
    # restores the pre-r5 value-carried loop — the engine-level A/B leg
    # and the escape hatch if a Mosaic version mishandles the pl.when).
    import os
    gated = os.environ.get("VROD_GATED_EXTRACT", "1") != "0"
    call = _fused_call_db if pipeline == "manual" else _fused_call
    vals, idx = call(
        x, aux2d, mask2d, q, offset, t0, qs, k=k, metric=metric,
        block_rows=block_rows, b_tile=b_tile,
        precision_name=precision_name, interpret=interpret, gated=gated,
        packed=packed)
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx
