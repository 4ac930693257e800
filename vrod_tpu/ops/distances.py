"""Exact kNN search ops: blocked distance matmul + running top-k.

This is the TPU-native realization of the reference's (stubbed)
SearchSimilarCommand (``/root/reference/src/command/types.rs:121-132``): the
collection lives as a (capacity, dim) tensor in HBM; queries are packed into a
(B, dim) tile; scores are computed block-by-block on the MXU with float32
accumulation and merged into a running top-k carried through a ``lax.scan`` —
the full (B, N) score matrix never materializes.

Score convention: higher is better for every metric.
  dot:    s = q . x
  cosine: s = (q_hat . x) * inv_norm_x          (queries pre-normalized)
  l2:     s = 2 q . x - |x|^2                    (|q|^2 - s = squared L2 dist)

Deleted / never-used slots are masked with -inf via the validity vector, so
free-list holes can never appear in results.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

NEG_INF = float("-inf")


def pack_int4(q4):
    """Pack int4 values (B, D) in [-8, 7] into int8 bytes (B, D/2).

    Byte j of a row holds dim ``j`` in its LOW nibble and dim ``j + D/2``
    in its HIGH nibble (dim-half split, not adjacent pairs): the unpacked
    halves then map to contiguous 128-lane-aligned query slices, so the
    kernel's two half-dim MXU dots need no interleave shuffle."""
    d = q4.shape[-1]
    if d % 2:
        raise ValueError(f"int4 packing needs an even dim, got {d}")
    d2 = d // 2
    lo = q4[..., :d2].astype(jnp.int8)
    hi = q4[..., d2:].astype(jnp.int8)
    return jnp.bitwise_or(jnp.left_shift(hi, 4),
                          jnp.bitwise_and(lo, jnp.int8(0x0F)))


def unpack_int4(xp, dtype=jnp.int8):
    """Unpack int8 bytes (..., D/2) into ((..., D/2) lo, (..., D/2) hi)
    signed int4 halves as ``dtype``. Sign extension runs in int32 (lane
    shifts on sub-word ints lower poorly on some backends): low nibble by
    a <<28 >>28 arithmetic round trip, high nibble by >>4 of the already
    sign-extended byte."""
    xi = xp.astype(jnp.int32)
    lo = lax.shift_right_arithmetic(lax.shift_left(xi, 28), 28)
    hi = lax.shift_right_arithmetic(xi, 4)
    return lo.astype(dtype), hi.astype(dtype)


def unpack_int4_rows(xp, dtype=jnp.float32):
    """Unpack packed rows (..., D/2) to full (..., D) rows in dim order
    (host/scan/rescore paths; the fused kernel keeps the halves separate
    and splits the query instead)."""
    lo, hi = unpack_int4(xp, dtype)
    return jnp.concatenate([lo, hi], axis=-1)


PRECISIONS = {
    # exact f32 products (6-pass bf16 on MXU) — guaranteed-exact scores
    "exact": lax.Precision.HIGHEST,
    # 3-pass bf16, ~f32-quality — default
    "high": lax.Precision.HIGH,
    # single-pass bf16 — fastest; pair with rescore for exactness
    "fast": lax.Precision.DEFAULT,
}


def block_scores(q, x_blk, aux_blk, valid_blk, *, metric: str, precision,
                 packed: bool = False):
    """Scores of query tile q (B, D) against one row block (BLK, D).

    The user-facing score contract is f32(query) x stored row. At exact
    precision the stored rows are upcast so no query bits are lost (the
    oracle definition the rescore path also computes); fast/high paths
    downcast the query onto the MXU and rely on the rescore margin.

    ``packed`` marks int4 collections: ``x_blk`` is (BLK, D/2) packed
    bytes (see ``pack_int4``); rows unpack to exact f32 integers in
    [-8, 7], then score exactly like the int8 branch (aux is the per-row
    dequant scale for every metric)."""
    if packed:
        lhs, rhs = q.astype(jnp.float32), unpack_int4_rows(x_blk)
    elif x_blk.dtype == jnp.int8:
        # Quantized collection: integer products are exact in f32 (values
        # <= 127), so the scan path computes them as f32 on any backend.
        # The epilogue is always the dequant multiply, whatever the metric.
        lhs, rhs = q.astype(jnp.float32), x_blk.astype(jnp.float32)
    elif precision == lax.Precision.HIGHEST:
        lhs, rhs = q.astype(jnp.float32), x_blk.astype(jnp.float32)
    else:
        lhs, rhs = q.astype(x_blk.dtype), x_blk
    g = lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if x_blk.dtype == jnp.int8:
        if metric == "l2":
            # Stored rep x_hat = aux * row. |x_hat|^2 = aux^2 * sum(row^2),
            # computed on the fly: sum(row^2) <= dim * 127^2 < 2^24 is
            # EXACT in f32 (config caps dim at 1040), and the O(BLK*D)
            # square-reduce is ~1/B of the matmul cost.
            n2 = jnp.sum(rhs * rhs, axis=1) * (aux_blk * aux_blk)
            s = 2.0 * (g * aux_blk[None, :]) - n2[None, :]
        else:  # cosine / dot: one dequant multiply
            s = g * aux_blk[None, :]
    elif metric == "cosine":
        s = g * aux_blk[None, :]
    elif metric == "l2":
        s = 2.0 * g - aux_blk[None, :]
    else:  # dot
        s = g
    return jnp.where(valid_blk[None, :], s, NEG_INF)


def merge_topk(carry_vals, carry_idx, new_vals, new_idx, k: int):
    """Merge (B, k) running top-k with (B, m) new candidates -> (B, k)."""
    cand_v = jnp.concatenate([carry_vals, new_vals], axis=1)
    cand_i = jnp.concatenate([carry_idx, new_idx], axis=1)
    top_v, pos = lax.top_k(cand_v, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_v, top_i


def blockwise_topk(x, aux, valid, q, *, k: int, metric: str,
                   precision, block_rows: int, nblocks: int,
                   index_offset=0, packed: bool = False):
    """Running top-k of q (B, D) against the first nblocks*block_rows rows.

    ``index_offset`` shifts returned row indices into the global slot space
    (used by the row-sharded path, where each shard scans its local rows).
    Returns (values (B, k) f32, indices (B, k) i32); empty ranks carry
    -inf / -1.
    """
    B = q.shape[0]
    n = nblocks * block_rows
    xs = x[:n].reshape(nblocks, block_rows, x.shape[1])
    auxs = aux[:n].reshape(nblocks, block_rows)
    valids = valid[:n].reshape(nblocks, block_rows)
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block_rows

    blk_iota = lax.broadcasted_iota(jnp.int32, (B, block_rows), 1)

    def step(carry, inputs):
        cv, ci = carry
        x_blk, aux_blk, valid_blk, start = inputs
        s = block_scores(q, x_blk, aux_blk, valid_blk,
                         metric=metric, precision=precision, packed=packed)
        idx = blk_iota + (start + index_offset)
        return merge_topk(cv, ci, s, idx, k), None

    init = (
        jnp.full((B, k), NEG_INF, dtype=jnp.float32),
        jnp.full((B, k), -1, dtype=jnp.int32),
    )
    (vals, idx), _ = lax.scan(step, init, (xs, auxs, valids, starts))
    # Rows whose score stayed -inf never matched a live slot.
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx


def sampled_threshold(x, aux, valid, q, *, k: int, metric: str, precision,
                      sub_rows: int = 128, max_fraction: int = 8,
                      method: str = "topk"):
    """A SOUND per-query floor for the k-th best score, from a prefix
    sample (warm-starts the Pallas extraction loop at large k).

    Scores the first ``n_sample`` rows, reduces them to per-``sub_rows``
    sub-block maxima, and returns the k-th largest sub-block max minus a
    safety margin. Soundness: the top-k sub-block maxima are k DISTINCT
    true elements all >= the k-th of them, so the true k-th best score is
    >= that value; the margin covers f32 accumulation-order divergence
    between this pass and the kernel's dot (bound (n-1)·u·Σ|terms| —
    ~1e-3 relative here, and the margin is 2e-3). Exactness of the final
    top-k is therefore preserved. Returns (B, 1) f32; -inf rows disable
    the floor (sample too small / too many deletions)."""
    n, b = x.shape[0], q.shape[0]
    n_sample = min(n, max(sub_rows * k * 2, n // max_fraction))
    n_sample = (n_sample // sub_rows) * sub_rows
    if n_sample // sub_rows < k:
        # Fewer sub-blocks than k: the k-th sub-max would only bound the
        # (subcount)-th best element — unsound as a k-th floor.
        return jnp.full((b, 1), NEG_INF, dtype=jnp.float32)
    s = block_scores(q, x[:n_sample], aux[:n_sample], valid[:n_sample],
                     metric=metric, precision=precision)
    sub = jnp.max(s.reshape(b, n_sample // sub_rows, sub_rows), axis=2)
    # One margin formula for every method: the duplicate minmax branch
    # that lived here carried a |kth|-relative-only margin, unsound when
    # the k-th score is near zero (see threshold_from_submax's note).
    return threshold_from_submax(
        sub, k, method="minmax" if method != "topk" else "topk")


def accumulation_margin(q, aux, valid, *, metric: str, dim: int,
                        safety: float = 20.0):
    """Per-query upper bound on fast-scan accumulation-order divergence for
    UNNORMALIZED metrics, making the sampled floor sound for dot/l2.

    Cauchy-Schwarz: |sum q_i x_i| error <= dim * 2^-24 * |q| * |x| across
    f32-accumulated reorderings; l2's ``2g - aux`` doubles the g term (aux
    is the identical f32 constant on both sides). max|x| comes from the
    VALID-masked aux lane, which stores |x|^2 for BOTH dot and l2 rows
    (dot's epilogue ignores aux, so the lane was free). ``safety`` matches
    the ~20x overbound the cosine absolute margin carries. Returns (B, 1).
    """
    m2 = jnp.max(jnp.where(valid, aux, 0.0))
    mnorm = jnp.sqrt(jnp.maximum(m2, 0.0))
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    per_dot = safety * dim * (2.0 ** -24) * qn * mnorm
    return per_dot * (2.0 if metric == "l2" else 1.0)


def kth_largest_count(sub, k: int):
    """EXACT per-row k-th largest of ``sub`` (B, nsub) f32 by counting —
    no sort, no top_k, no score materialization beyond one (B, nsub)
    compare at a time.

    Floats are mapped to order-isomorphic int32 keys (sign-magnitude →
    two's-complement flip: ``b ^ ((b >> 31) & 0x7fffffff)``, an
    involution), then the answer is built MSB-first by binary lifting:
    the k-th largest key is exactly the maximum v with
    count(keys >= v) >= k, and that predicate is monotone in v, so one
    sign-bit count plus 31 greedy bit probes — all int32, no x64 —
    find it. Each probe is one vectorized compare+sum
    over (B, nsub) — at the floor pre-pass's nsub (~1024) that is a few
    hundred KB of VPU traffic x 32, microseconds, vs ~0.8 ms for
    ``lax.approx_max_k`` (kexp14) whose 0.95-recall misses also LOOSEN
    the floor (its k-th return can sit below the true k-th sub-max).
    -inf / repeated values are handled by construction (counting sees
    every tie). Returns (B, 1) f32 — the true k-th order statistic."""
    b = sub.shape[0]
    bits = lax.bitcast_convert_type(sub.astype(jnp.float32), jnp.int32)
    flip = lax.shift_right_arithmetic(bits, 31) & jnp.int32(0x7FFFFFFF)
    keys = bits ^ flip

    def count_ge(v):
        return jnp.sum((keys >= v).astype(jnp.int32), axis=1,
                       keepdims=True)

    # Pure int32 (x64 stays disabled): the sign bit is decided by one
    # count, then 31 probes lift the magnitude bits within that domain —
    # cand = ans + 2^i never overflows (max 0 + (2^31 - 1), or
    # INT32_MIN + (2^31 - 1) = -1).
    imin = jnp.int32(-2147483648)
    ans = jnp.where(count_ge(jnp.int32(0)) >= k,
                    jnp.zeros((b, 1), jnp.int32),
                    jnp.full((b, 1), imin))

    def probe(i, ans):
        cand = ans + lax.shift_left(jnp.int32(1), jnp.int32(30) - i)
        return jnp.where(count_ge(cand) >= k, cand, ans)

    ans = lax.fori_loop(0, 31, probe, ans)
    kth_flip = lax.shift_right_arithmetic(ans, 31) & jnp.int32(0x7FFFFFFF)
    return lax.bitcast_convert_type(ans ^ kth_flip, jnp.float32)


def threshold_from_submax(sub, k: int, *, approx: bool = False,
                          margin_abs: float = 1e-3, extra=None,
                          method: str = "topk"):
    """Turn (B, nsub) sub-block score maxima into a sound k-th-best floor
    (see ``sampled_threshold``); -inf disables where nsub < k.

    ``approx=True`` uses ``lax.approx_max_k`` (the TPU-native bucketed
    reduction — measured ~5x cheaper than exact top_k at nsub 8192). Still
    SOUND: the values it returns are true elements, so its k-th value has
    k distinct elements >= it; missing a few true top-k items only makes
    the floor slightly looser, never unsafe.

    ``method="minmax"`` replaces the top-k entirely with reductions:
    partition the sub-maxima into k groups, take each group's max, then
    the min over groups — k distinct true elements >= that min, so it is
    a sound (slightly looser) k-th floor at ~1/20 the cost.

    ``method="count"`` computes the EXACT k-th sub-max by counting
    (``kth_largest_count``): the tightest floor any method here can
    produce, with no sorting network at all."""
    b = sub.shape[0]
    if sub.shape[1] < k:
        return jnp.full((b, 1), NEG_INF, dtype=jnp.float32)
    if method == "count":
        kth = kth_largest_count(sub, k)
    elif method == "minmax":
        g = sub.shape[1] // k
        kth = jnp.min(
            jnp.max(sub[:, :g * k].reshape(b, k, g), axis=2),
            axis=1, keepdims=True)
    elif approx:
        kth = lax.approx_max_k(sub, k, recall_target=0.95)[0][:, k - 1:k]
    else:
        kth = lax.top_k(sub, k)[0][:, k - 1:k]
    # Safety margin for accumulation-order divergence between this pass
    # and the search kernel: bounded by (n-1)·u·Σ|q_i x_i|. For COSINE
    # (normalized query x unit-direction rows after the aux multiply)
    # Cauchy-Schwarz gives Σ|terms| <= 1, so an ABSOLUTE 1e-3 margin is a
    # ~20x overbound of the worst case (768·2^-24 ≈ 4.6e-5) and stays
    # sound even when the k-th score is near zero — a |kth|-relative
    # margin alone would not be. For unnormalized metrics the magnitude
    # bound is data-dependent; callers pass it via ``extra``
    # (``accumulation_margin``) for dot/l2. ``margin_abs`` tunes the
    # absolute term (default 1e-3 is the conservative ~20x overbound;
    # 2e-4 is still ~4x).
    t0 = kth - (jnp.abs(kth) * 1e-3 + margin_abs)
    if extra is not None:
        t0 = t0 - extra
    return jnp.where(jnp.isfinite(t0), t0, NEG_INF).astype(jnp.float32)


def rescore(x, aux, valid, q, cand_idx, *, k: int, metric: str,
            packed: bool = False):
    """Exact (HIGHEST-precision) rescore of candidate rows.

    ``cand_idx`` is (B, k') from a fast scan with k' >= k; gathers the
    candidate rows and recomputes their scores with exact f32 accumulation,
    then reduces to the final top-k. Cost is O(B * k' * D) — negligible next
    to the scan. ``packed`` (int4 collections) unpacks the gathered rows
    first; dequantization is exact either way, so recall stays exact
    w.r.t. the stored representation.
    """
    safe_idx = jnp.maximum(cand_idx, 0)
    b, kp = safe_idx.shape
    # Flat take + reshape gathers ~15% faster than x[idx] on TPU (measured,
    # experiments/kexp4.py).
    rows = jnp.take(x, safe_idx.reshape(-1), axis=0).reshape(
        b, kp, x.shape[1])                  # (B, k', D) (packed: D/2 bytes)
    if packed:
        rows = unpack_int4_rows(rows)
    g = jnp.einsum(
        "bkd,bd->bk", rows.astype(jnp.float32), q.astype(jnp.float32),
        precision=lax.Precision.HIGHEST,
    )
    aux_c = aux[safe_idx]
    if x.dtype == jnp.int8:
        if metric == "l2":
            # Same |x_hat|^2 reconstruction as block_scores (exact in f32).
            n2 = jnp.sum(rows.astype(jnp.float32) ** 2, axis=2) \
                * (aux_c * aux_c)
            s = 2.0 * (g * aux_c) - n2
        else:
            s = g * aux_c  # aux is the per-row dequant scale
    elif metric == "cosine":
        s = g * aux_c
    elif metric == "l2":
        s = 2.0 * g - aux_c
    else:
        s = g
    ok = (cand_idx >= 0) & valid[safe_idx]
    s = jnp.where(ok, s, NEG_INF)
    top_v, pos = lax.top_k(s, k)
    top_i = jnp.take_along_axis(cand_idx, pos, axis=1)
    top_i = jnp.where(jnp.isneginf(top_v), -1, top_i)
    return top_v, top_i


def finalize_scores(vals, q, *, metric: str):
    """Convert internal max-scores to user-facing values.

    cosine -> cosine similarity (as-is); dot -> inner product (as-is);
    l2 -> squared euclidean distance |q|^2 - s (smaller is better, but rank
    order of results is already correct).
    """
    if metric == "l2":
        qq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        return jnp.where(jnp.isneginf(vals), jnp.inf, qq - vals)
    return vals


def prepare_rows(vecs, *, metric: str, dtype):
    """Compute (stored_rows, aux) for new vectors on insert.

    float32/bfloat16: rows stored unmodified (cast) so exact-lookup SEARCH
    returns the original embedding; aux = 1/|x| (cosine), |x|^2 (l2), 0
    (dot).

    int8 (quantized scan): rows are symmetrically quantized per row —
    cosine stores round(x/|x| / s) with s = max|x_i/|x||/127, dot and l2
    store round(x / s). aux = s, so dequantization is exactly
    ``stored * aux``; the score epilogue is ``g * aux`` for cosine/dot and
    reconstructs |x_hat|^2 = aux^2 * sum(row^2) on the fly for l2 (exact
    in f32 for dim <= 1040). The exact rescore dequantizes and scores
    against the full f32 query, so recall is exact w.r.t. the stored
    (quantized) representation — the same contract as bf16 storage.

    dtype="int4" (capacity tier, 2x int8's rows/chip): same per-row
    symmetric scheme at 4 bits (s = max|base|/7, values in [-7, 7]),
    stored PACKED two-dims-per-byte (``pack_int4``). aux = s exactly as
    int8; every downstream consumer unpacks before dequantizing.
    """
    vecs32 = vecs.astype(jnp.float32)
    packed4 = isinstance(dtype, str) and dtype == "int4"
    if packed4 or jnp.dtype(dtype) == jnp.int8:
        if metric == "cosine":
            norms = jnp.linalg.norm(vecs32, axis=1, keepdims=True)
            base = vecs32 / jnp.maximum(norms, 1e-30)
        else:  # dot / l2
            base = vecs32
        qmax = 7.0 if packed4 else 127.0
        scale = jnp.max(jnp.abs(base), axis=1) / qmax
        q8 = jnp.clip(
            jnp.round(base / jnp.maximum(scale[:, None], 1e-30)),
            -qmax, qmax).astype(jnp.int8)
        if packed4:
            q8 = pack_int4(q8)
        return q8, scale.astype(jnp.float32)
    if metric == "cosine":
        norms = jnp.linalg.norm(vecs32, axis=1)
        aux = jnp.where(norms > 0, 1.0 / jnp.maximum(norms, 1e-30), 0.0)
    else:
        # l2 needs |x|^2 in the epilogue; dot's epilogue ignores aux, so
        # the lane stores |x|^2 there too — it feeds the sampled floor's
        # accumulation_margin (max row norm) at zero extra storage.
        aux = jnp.sum(vecs32 * vecs32, axis=1)
    return vecs32.astype(dtype), aux.astype(jnp.float32)


def prepare_queries(q, *, metric: str, quantize: bool = False,
                    return_scale: bool = False):
    """Normalize queries for cosine; pass-through otherwise.

    ``quantize=True`` (int8 collections, fast scan path) symmetrically
    quantizes each query to int8 for the integer MXU. For cosine/dot the
    per-query scale is a positive scalar, so per-query ranking is
    unaffected and it is simply dropped; l2 needs it in the epilogue
    (it multiplies only the cross term of 2 q.x - |x|^2), so
    ``return_scale=True`` returns ``(q_int8, scale (B, 1) f32)``. The
    exact rescore always uses the full f32 query."""
    q = q.astype(jnp.float32)
    if metric == "cosine":
        norms = jnp.linalg.norm(q, axis=1, keepdims=True)
        q = q / jnp.maximum(norms, 1e-30)
    if quantize:
        scale = jnp.maximum(
            jnp.max(jnp.abs(q), axis=1, keepdims=True) / 127.0, 1e-30)
        q = jnp.clip(jnp.round(q / scale), -127, 127).astype(jnp.int8)
        if return_scale:
            return q, scale
    return q
