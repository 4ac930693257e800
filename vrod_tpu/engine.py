"""Device engine: HBM-resident collection tensors + compiled search/update.

A collection's device state is three arrays, row-sharded over the mesh
(single-chip = 1-device mesh, so there is exactly one code path):

  x     (capacity, dim)  collection dtype — the embedding rows
  aux   (capacity,) f32  — 1/|x| (cosine) or |x|^2 (l2/dot); int8: the
                           per-row dequant scale
  valid (capacity,) bool — live bitmap (free-list holes & deletes are False)
  norms (capacity,) f32  — int8+l2 only: |x_hat|^2 for the fused kernel's
                           epilogue bias. DERIVABLE from x+aux (the scan and
                           rescore paths reconstruct it on the fly), so it
                           is never snapshotted — restore recomputes it.

Capacity grows in whole segments so shapes stay static between growth events
(one recompile per growth). Mutations are jit-compiled scatters with donated
buffers, so inserts/deletes never double HBM. Search is a ``jax.shard_map``
program: each shard runs the blocked distance+top-k scan over its local rows
(jnp scan or the fused Pallas kernel), per-shard top-k merges via an
all-gather over ICI, and an optional exact-precision rescore finalizes the
result — realizing the reference's intended SearchSimilar path
(``/root/reference/src/command/types.rs:121-132``) TPU-natively.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .config import CollectionConfig
from .ops import distances as D
from .ops import pallas_topk
from .parallel.mesh import ROWS_AXIS, make_mesh, replicated, row_sharding, vec_sharding

# Queries are padded to these batch tiles to bound the number of compiled
# programs; 8 is the f32 sublane tile, larger tiles feed the MXU better.
BATCH_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
# Finer spacing in the 64-128 band: k=100 (the classic rerank size and
# BASELINE config 3) gets its own bucket — extraction cost is linear in
# k_scan = k_out + margin, so k_out 128 -> 100 cut the top-100 batch
# latency ~1.6 ms total across the two bucket refinements.
K_BUCKETS = (8, 16, 32, 64, 96, 100, 112, 128, 256, 512, 1024)
MAX_K = 1024
DEFAULT_SEARCH_BLOCK_ROWS = 8192


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(math.ceil(n / buckets[-1])) * buckets[-1]


def _pick_block_rows(rows_local: int, segment_rows: int) -> int:
    block = min(segment_rows, rows_local)
    while block > DEFAULT_SEARCH_BLOCK_ROWS and block % 2 == 0:
        block //= 2
    while rows_local % block != 0:  # defensive; segment_rows divides rows_local
        block //= 2
    return max(block, 8)


@functools.lru_cache(maxsize=256)
def _search_fn(mesh_key, B, k_out, k_scan, metric, precision_name, dtype_name,
               rows_local, block_rows, shards, do_rescore, impl,
               use_theta0=True, theta0_margin=1e-3, theta0_frac=8,
               theta0_method="count", theta0_blk=2048, theta0_mink=64):
    """Build + jit the full search program for one static configuration."""
    mesh = _MESHES[mesh_key]
    precision = D.PRECISIONS[precision_name]
    nblocks = rows_local // block_rows
    # Pallas TPU kernels run interpreted on CPU meshes (tests / dry runs).
    interpret = mesh.devices.flat[0].platform != "tpu"

    # int8/int4 collections scan with a quantized query on the integer MXU
    # (per-query scale is rank-invariant and dropped); the exact-precision
    # scan path and the rescore keep the full f32 query. l2 is special:
    # the query scale multiplies only the cross term of 2*q.x_hat -
    # |x_hat|^2, so it cannot be dropped — the fused kernel takes it as a
    # per-query input (with the |x_hat|^2 lane riding the mask stream),
    # while the scan path keeps the full f32 query. int4 shares every
    # int8 decision (the stored nibbles just unpack first); ``packed``
    # routes the kernels to the two-half-dim unpacking dot.
    quant = dtype_name in ("int8", "int4")
    packed = dtype_name == "int4"
    use_norms = quant and metric == "l2"
    l2_qs = use_norms and impl == "pallas"
    quantize_q = quant and metric != "l2" and (
        impl == "pallas" or precision_name != "exact")

    def merge_shards(vals, idx):
        # (S, B, k) on every shard; merge locally => replicated result.
        vals_g = lax.all_gather(vals, ROWS_AXIS)
        idx_g = lax.all_gather(idx, ROWS_AXIS)
        cand_v = jnp.moveaxis(vals_g, 0, 1).reshape(B, shards * k_scan)
        cand_i = jnp.moveaxis(idx_g, 0, 1).reshape(B, shards * k_scan)
        vals, pos = lax.top_k(cand_v, k_scan)
        return vals, jnp.take_along_axis(cand_i, pos, axis=1)

    def _gate_for(blk):
        # Small k: extraction is cheap, so the pre-pass must be too —
        # shrink the sample to rows/32 (kexp small-k A/B: +2.6% at
        # k_scan 28 vs a measured net loss with the rows/8 sample).
        frac = theta0_frac if k_scan >= 64 else max(theta0_frac, 32)
        n_sample = min(rows_local, max(128 * k_scan * 2,
                                       rows_local // frac))
        # Round to whole pre-pass blocks (sampled_submax would halve
        # its block size on a non-divisible sample).
        n_sample = (n_sample // blk) * blk
        # nsub = 128 maxima per pre-pass block: the k-th sub-max is
        # only a sound k-th floor when there are at least k_scan
        # sub-maxima (with margin: 2x).
        nsub = (n_sample // blk) * 128
        # Below k_scan 64 the floor only pays for int8 (same-session
        # A/B: +2.5% int8, -0.9% bf16 — int8's cheaper stream makes
        # extraction relatively dearer). int4's stream is cheaper still,
        # so it inherits the int8 gate.
        min_k = theta0_mink if quant else 64
        ok = use_theta0 and k_scan >= min_k and nsub >= 2 * k_scan \
            and rows_local >= min(frac, 4) * n_sample
        return ok, n_sample

    def floor_gate(dim, itemsize):
        """Eligibility + sample size + pre-pass block for the sampled
        floor. Block auto-selection (theta0_blk == 0, the default): the
        LARGEST block that keeps the gate open — fewer sub-maxima halve
        the approx_max_k threshold cost (kexp16: 16384 is +2.1% over 8192
        at 1M top-100, recall 1.0; 32768 gave it back), while the 8192
        fallback preserves the gate for mid-size collections whose sample
        would round to zero 16384-blocks. Soundness is grouping-invariant
        (any partition of sampled rows yields true element maxima).
        Auto-selection skips blocks whose x-tile busts sampled_submax's
        VMEM budget (e.g. f32 at dim > 384): the kernel would halve the
        block anyway, but AFTER the sample was rounded to the oversized
        block — a strictly looser floor than selecting the smaller block
        here."""
        if theta0_blk:  # explicit VROD_THETA0_BLK override
            ok, n_sample = _gate_for(theta0_blk)
            return ok, n_sample, theta0_blk
        cands, fallback = [], 8192
        for blk in (16384, 8192):
            while blk * dim * itemsize > pallas_topk.SUBMAX_VMEM_BYTES \
                    and blk > 128:
                blk //= 2
            fallback = blk
            if blk not in cands:
                cands.append(blk)
        for blk in cands:
            ok, n_sample = _gate_for(blk)
            if ok:
                return True, n_sample, blk
        return False, 0, fallback

    def local_topk(*args):
        """Per-shard scan + top-k; one body for both state layouts:
        (x, aux, valid, q) and, for int8+l2, (x, aux, norms, valid, q, qs)
        — norms feeds the fused kernel's additive -|x_hat|^2 mask bias
        and qs the per-query quant scale."""
        if use_norms:
            x_l, aux_l, norms_l, valid_l, q, qs = args
            extras = dict(row_bias=-norms_l, q_scale=qs)
        else:
            x_l, aux_l, valid_l, q = args
            norms_l, extras = None, {}
        offset = lax.axis_index(ROWS_AXIS).astype(jnp.int32) * rows_local
        if impl == "pallas":
            # Warm-start the extraction loop with a sound sampled floor
            # (extraction cost is linear in k_scan and dominated by the
            # cold-carry over-extraction of early blocks). The sub-max
            # pre-pass is itself a fused Pallas kernel — the XLA version
            # materializes the (B, n_sample) score matrix and costs more
            # than it saves (measured, experiments/kexp7.py).
            theta0 = None
            ok, n_sample, blk = floor_gate(
                x_l.shape[1], x_l.dtype.itemsize)
            if ok:
                sub_extras = dict(extras)
                if use_norms:
                    sub_extras["row_bias"] = -norms_l[:n_sample]
                sub = pallas_topk.sampled_submax(
                    x_l[:n_sample], aux_l[:n_sample], valid_l[:n_sample],
                    q, metric=metric, precision_name=precision_name,
                    block_rows=blk, interpret=interpret, packed=packed,
                    **sub_extras)
                # Accumulation-noise margin between the pre-pass and the
                # main kernel: cosine's normalized scores admit a rigorous
                # ABSOLUTE bound (the margin_abs term); bf16/f32 dot/l2
                # get a per-query Cauchy-Schwarz bound from |q| and the
                # valid-masked max row norm (aux stores |x|^2 for both —
                # see accumulation_margin). int8 dot/l2 need NO extra
                # margin: the integer dot is order-independent and the
                # epilogue elementwise, so the only possible divergence
                # is per-op rounding (e.g. FMA contraction differing
                # between the two kernels) at ~1 ulp ≈ 1e-7 relative —
                # threshold_from_submax's retained |kth|*1e-3 relative
                # slack overbounds it by ~4 orders of magnitude.
                extra = None
                if metric != "cosine" and not quant:
                    extra = D.accumulation_margin(
                        q, aux_l, valid_l, metric=metric, dim=x_l.shape[1])
                # Threshold methods (VROD_THETA0_METHOD): "count" (the
                # default since round 5) = exact k-th sub-max by counting
                # radix-lift (kth_largest_count) — kexp19's A/B/A bracket
                # measured it a wash vs "approx" (lax.approx_max_k,
                # ~0.8 ms at nsub 8192, kexp14), and at equal cost the
                # exact method gives the provably tighter floor; "minmax"
                # = reduction-only (measured looser-net-loss, kexp14).
                theta0 = D.threshold_from_submax(
                    sub, k_scan, approx=theta0_method == "approx",
                    margin_abs=theta0_margin, extra=extra,
                    method=theta0_method
                    if theta0_method in ("minmax", "count") else "topk")
            vals, idx = pallas_topk.fused_topk(
                x_l, aux_l, valid_l, q, k=k_scan, metric=metric,
                block_rows=block_rows, index_offset=offset,
                precision_name=precision_name, interpret=interpret,
                theta0=theta0, packed=packed, **extras)
        else:
            vals, idx = D.blockwise_topk(
                x_l, aux_l, valid_l, q, k=k_scan, metric=metric,
                precision=precision, block_rows=block_rows, nblocks=nblocks,
                index_offset=offset, packed=packed)
        if shards > 1:
            vals, idx = merge_shards(vals, idx)
        return vals, idx

    in_specs = (
        (P(ROWS_AXIS, None), P(ROWS_AXIS))
        + ((P(ROWS_AXIS),) if use_norms else ())   # norms
        + (P(ROWS_AXIS), P())
        + ((P(),) if use_norms else ()))           # qs
    sm = jax.shard_map(
        local_topk,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )

    def finish(x, aux, valid, q, qp, vals, idx):
        if do_rescore:
            vals, idx = D.rescore(x, aux, valid, qp, idx, k=k_out,
                                  metric=metric, packed=packed)
        else:
            vals, idx = vals[:, :k_out], idx[:, :k_out]
        return D.finalize_scores(vals, q, metric=metric), idx

    if use_norms:
        def search(x, aux, norms, valid, q):
            qp = D.prepare_queries(q, metric=metric)
            if l2_qs:
                q_scan, qs = D.prepare_queries(
                    q, metric=metric, quantize=True, return_scale=True)
            else:  # scan impl: full f32 query, qs unused
                q_scan = qp
                qs = jnp.ones((qp.shape[0], 1), jnp.float32)
            vals, idx = sm(x, aux, norms, valid, q_scan, qs)
            return finish(x, aux, valid, q, qp, vals, idx)
    else:
        def search(x, aux, valid, q):
            qp = D.prepare_queries(q, metric=metric)
            q_scan = D.prepare_queries(q, metric=metric, quantize=True) \
                if quantize_q else qp
            vals, idx = sm(x, aux, valid, q_scan)
            return finish(x, aux, valid, q, qp, vals, idx)

    return jax.jit(search)


# Registry of live meshes keyed by a stable topology fingerprint (device
# ids + shape + axis names): collections on the same topology share one
# registry entry — and therefore share lru_cache'd compiled search programs.
# Values are held weakly so a dropped collection's mesh doesn't outlive its
# last strong reference (cached closures keep theirs alive until lru
# eviction, which bounds the total).
import weakref

_MESHES: "weakref.WeakValueDictionary[tuple, object]" = \
    weakref.WeakValueDictionary()


def _mesh_key(mesh) -> tuple:
    key = (tuple(int(d.id) for d in mesh.devices.flat),
           tuple(mesh.devices.shape), tuple(mesh.axis_names))
    if _MESHES.get(key) is None:
        _MESHES[key] = mesh
    return key


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("metric", "packed"))
def _write_rows(x, aux, valid, slots, vecs, *, metric, packed=False):
    rows, auxv = D.prepare_rows(vecs, metric=metric,
                                dtype="int4" if packed else x.dtype)
    x = x.at[slots].set(rows, mode="drop")
    aux = aux.at[slots].set(auxv, mode="drop")
    valid = valid.at[slots].set(True, mode="drop")
    return x, aux, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _write_rows_raw(x, aux, valid, slots, rows, auxv):
    """Scatter already-prepared rows (snapshot restore: the stored
    representation round-trips bit-exactly, no requantization)."""
    x = x.at[slots].set(rows.astype(x.dtype), mode="drop")
    aux = aux.at[slots].set(auxv.astype(aux.dtype), mode="drop")
    valid = valid.at[slots].set(True, mode="drop")
    return x, aux, valid


@functools.partial(jax.jit, donate_argnums=(0,))
def _erase_rows(valid, slots):
    return valid.at[slots].set(False, mode="drop")


# int8/int4+l2 engines carry a 4th array, norms (capacity,) f32 = |x_hat|^2
# per row: the fused kernel streams it as the additive mask bias (the scan
# path and the rescore reconstruct it from rows+aux on the fly, so it is
# DERIVABLE state — never snapshotted; restore recomputes it below). The
# stored value is (aux*aux) * sum(row^2): sum(row^2) <= dim*127^2 < 2^24 is
# exact in f32 and the multiply order matches distances.rescore bit-for-bit
# (int4 rows unpack first — identical values, same order).
def _row_norms2(rows, auxv, packed=False):
    if packed:
        rows = D.unpack_int4_rows(rows)
    n2 = jnp.sum(rows.astype(jnp.float32) ** 2, axis=1)
    return n2 * (auxv.astype(jnp.float32) * auxv.astype(jnp.float32))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("metric", "packed"))
def _write_rows_n(x, aux, norms, valid, slots, vecs, *, metric,
                  packed=False):
    rows, auxv = D.prepare_rows(vecs, metric=metric,
                                dtype="int4" if packed else x.dtype)
    x = x.at[slots].set(rows, mode="drop")
    aux = aux.at[slots].set(auxv, mode="drop")
    norms = norms.at[slots].set(_row_norms2(rows, auxv, packed),
                                mode="drop")
    valid = valid.at[slots].set(True, mode="drop")
    return x, aux, norms, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("packed",))
def _write_rows_raw_n(x, aux, norms, valid, slots, rows, auxv,
                      *, packed=False):
    rows = rows.astype(x.dtype)
    auxv = auxv.astype(aux.dtype)
    x = x.at[slots].set(rows, mode="drop")
    aux = aux.at[slots].set(auxv, mode="drop")
    norms = norms.at[slots].set(_row_norms2(rows, auxv, packed),
                                mode="drop")
    valid = valid.at[slots].set(True, mode="drop")
    return x, aux, norms, valid


@functools.partial(jax.jit, donate_argnums=(2,),
                   static_argnames=("packed",))
def _rebuild_norms(x, aux, norms, *, packed=False):
    # One full pass over x; invalid slots get garbage-but-masked values
    # (the kernel's mask stream -inf's them before they can score).
    return _row_norms2(x, aux, packed)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _move_rows_n(x, aux, norms, valid, src, dst):
    x = x.at[dst].set(x[src], mode="drop")
    aux = aux.at[dst].set(aux[src], mode="drop")
    norms = norms.at[dst].set(norms[src], mode="drop")
    valid = valid.at[dst].set(valid[src], mode="drop")
    valid = valid.at[src].set(False, mode="drop")
    return x, aux, norms, valid


@functools.lru_cache(maxsize=256)
def _mask_builder(mesh_key, cap, base):
    """Jitted filter-mask scatter for one (mesh, capacity, polarity); the
    slot-array shape is bucketed by the caller, bounding compile count."""
    mesh = _MESHES[mesh_key]
    vs = vec_sharding(mesh)

    @functools.partial(jax.jit, out_shardings=vs)
    def build(sl):
        m = jnp.full((cap,), base, dtype=jnp.bool_)
        return m.at[sl].set(not base, mode="drop")

    return build


@jax.jit
def _and_masks(valid, filter_mask):
    """Filtered search: restrict the scan to ``valid & filter``. Both inputs
    share the row sharding, so the AND stays on-shard (no collective)."""
    return jnp.logical_and(valid, filter_mask)


@functools.lru_cache(maxsize=64)
def _replicated_gather(mesh_key):
    """Collective snapshot gather for a process-spanning mesh: the output
    replicates to EVERY process (each rank then writes its own local
    snapshot files), because device rows are not addressable from any
    single host there. One compile per mesh (chunk shapes add a couple)."""
    mesh = _MESHES[mesh_key]
    rep = replicated(mesh)

    @functools.partial(jax.jit, out_shardings=(rep, rep))
    def g(x, aux, slots):
        return x[slots], aux[slots]

    return g


@jax.jit
def _gather_rows(x, slots):
    return x[slots].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("packed",))
def _gather_rows_dequant(x, aux, slots, *, packed=False):
    """int8/int4 collections: exact-lookup returns the dequantized row
    (for cosine collections this is the stored normalized direction)."""
    rows = x[slots]
    if packed:
        rows = D.unpack_int4_rows(rows)
    return rows.astype(jnp.float32) * aux[slots][:, None]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _move_rows(x, aux, valid, src, dst):
    """Compaction: move rows src -> dst, then invalidate src."""
    x = x.at[dst].set(x[src], mode="drop")
    aux = aux.at[dst].set(aux[src], mode="drop")
    valid = valid.at[dst].set(valid[src], mode="drop")
    valid = valid.at[src].set(False, mode="drop")
    return x, aux, valid


def _init_arrays(mesh, capacity, dim, dtype, with_norms=False):
    xs, vs = row_sharding(mesh), vec_sharding(mesh)

    if with_norms:
        @functools.partial(jax.jit, out_shardings=(xs, vs, vs, vs))
        def init():
            return (
                jnp.zeros((capacity, dim), dtype=dtype),
                jnp.zeros((capacity,), dtype=jnp.float32),
                jnp.zeros((capacity,), dtype=jnp.float32),
                jnp.zeros((capacity,), dtype=jnp.bool_),
            )
    else:
        @functools.partial(jax.jit, out_shardings=(xs, vs, vs))
        def init():
            return (
                jnp.zeros((capacity, dim), dtype=dtype),
                jnp.zeros((capacity,), dtype=jnp.float32),
                jnp.zeros((capacity,), dtype=jnp.bool_),
            )

    return init()


class DeviceEngine:
    """Owns the device state of one collection."""

    def __init__(self, cfg: CollectionConfig, mesh=None, devices=None):
        self.cfg = cfg
        if mesh is None:
            from .runtime import default_devices
            avail = devices if devices is not None else default_devices()
            shards = cfg.shards
            if shards > len(avail):
                # A collection sharded on a larger topology restores fine on
                # fewer chips: snapshots/WAL address record ids, not slots,
                # so the row layout is rebuilt for the local mesh.
                import warnings
                warnings.warn(
                    f"Collection {cfg.name!r} configured for {shards} shards "
                    f"but only {len(avail)} devices are available; "
                    f"row-sharding over {len(avail)}.")
                shards = len(avail)
            mesh = make_mesh(shards, avail)
        self.mesh = mesh
        self.shards = self.mesh.devices.size
        # True when the mesh's devices span OS processes (multi-host DCN):
        # every jit dispatch over the collection arrays is then a collective
        # program that ALL processes must execute, and device->host reads
        # are not fully addressable from any single process.
        self.multiprocess = len(
            {d.process_index for d in self.mesh.devices.flat}) > 1
        # One token per collective engine construction, identical on every
        # rank and unique across the process group's lifetime: collective
        # maintenance keys its host-side coordination-KV agreement rounds
        # on it (KV values are immutable, so keys must never collide across
        # loads — see Collection._mh_agreed_write). Engine construction is
        # single-threaded and collective (the array init right below is an
        # SPMD program), so this tiny allgather sits at the same position
        # in every rank's dispatch stream.
        self.mh_nonce = 0
        if self.multiprocess:
            import time as _time
            from jax.experimental import multihost_utils
            self.mh_nonce = int(np.asarray(multihost_utils.process_allgather(
                np.int64(_time.time_ns())))[0])
        # int4 stores two dims per int8 byte (dim-half nibble split —
        # distances.pack_int4): device arrays are int8 at dim/2 columns,
        # halving HBM per row vs int8 (double the rows/chip).
        self.packed = cfg.dtype == "int4"
        self.dtype = jnp.dtype(jnp.int8) if self.packed \
            else jnp.dtype(cfg.dtype)
        self.storage_dim = cfg.dim // 2 if self.packed else cfg.dim
        # int8/int4+l2 maintain a derivable |x_hat|^2 lane for the fused
        # kernel's epilogue (the scan/rescore paths reconstruct it on the
        # fly; snapshots never store it — write_raw recomputes on restore).
        self.has_norms = self.dtype == jnp.int8 and cfg.metric == "l2"
        self.norms = None
        # Capacity granularity: whole segments, evenly divided over shards.
        self._grow_unit = cfg.segment_rows * self.shards
        self.capacity = self._grow_unit
        if self.has_norms:
            self.x, self.aux, self.norms, self.valid = _init_arrays(
                self.mesh, self.capacity, self.storage_dim, self.dtype,
                with_norms=True)
        else:
            self.x, self.aux, self.valid = _init_arrays(
                self.mesh, self.capacity, self.storage_dim, self.dtype)
        # Default search behavior (overridable per query). The fused Pallas
        # kernel is the production path on TPU (at the HBM roofline); the
        # scan path serves CPU meshes (pallas would run interpreted) and
        # acts as the reference implementation.
        on_tpu = self.mesh.devices.flat[0].platform == "tpu"
        self.precision = "fast" if on_tpu else "high"
        self.impl = "pallas" if on_tpu else "scan"
        self.rescore = True

    # -- capacity ----------------------------------------------------------

    def ensure_capacity(self, needed_slots: int) -> bool:
        """Grow device arrays so at least ``needed_slots`` exist. True if grown."""
        if needed_slots <= self.capacity:
            return False
        new_cap = int(math.ceil(needed_slots / self._grow_unit)) * self._grow_unit
        xs, vs = row_sharding(self.mesh), vec_sharding(self.mesh)
        n_extra = 1 if self.has_norms else 0

        @functools.partial(jax.jit, donate_argnums=tuple(range(3 + n_extra)),
                           out_shardings=(xs,) + (vs,) * (2 + n_extra))
        def grow(x, *vecs1d):
            pad = new_cap - x.shape[0]
            return (
                jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)]),
            ) + tuple(
                jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
                for v in vecs1d)

        if self.has_norms:
            self.x, self.aux, self.norms, self.valid = grow(
                self.x, self.aux, self.norms, self.valid)
        else:
            self.x, self.aux, self.valid = grow(self.x, self.aux, self.valid)
        self.capacity = new_cap
        return True

    def shrink_target(self, needed_slots: int) -> int:
        """Smallest whole-segment capacity holding ``needed_slots`` — the
        single rounding rule shared by shrink_capacity, the collection's
        allocator shrink, and the auto-compact trigger."""
        return max(self._grow_unit,
                   int(math.ceil(needed_slots / self._grow_unit))
                   * self._grow_unit)

    def shrink_capacity(self, needed_slots: int) -> bool:
        """Shrink device arrays to ``shrink_target(needed_slots)``
        (post-compaction: REINDEX packs live rows into [0, live), so empty
        tail segments can be reclaimed — the scan cost is proportional to
        CAPACITY, not live count, because shapes are static). True if
        shrunk (one recompile, like growth)."""
        new_cap = self.shrink_target(needed_slots)
        if new_cap >= self.capacity:
            return False
        xs, vs = row_sharding(self.mesh), vec_sharding(self.mesh)
        n_extra = 1 if self.has_norms else 0

        @functools.partial(jax.jit, donate_argnums=tuple(range(3 + n_extra)),
                           static_argnames=("cap",),
                           out_shardings=(xs,) + (vs,) * (2 + n_extra))
        def cut(*arrs, cap):
            return tuple(a[:cap] for a in arrs)

        if self.has_norms:
            self.x, self.aux, self.norms, self.valid = cut(
                self.x, self.aux, self.norms, self.valid, cap=new_cap)
        else:
            self.x, self.aux, self.valid = cut(
                self.x, self.aux, self.valid, cap=new_cap)
        self.capacity = new_cap
        return True

    @property
    def rows_local(self) -> int:
        return self.capacity // self.shards

    # -- mutations ---------------------------------------------------------

    # Rows per host->device transfer chunk. Large restores stream in chunks:
    # jit dispatch is async, so chunk N+1's host staging overlaps chunk N's
    # DMA + scatter (the double-buffered streaming restore of SURVEY §5).
    WRITE_CHUNK_ROWS = 131072

    def write(self, slots: np.ndarray, vecs: np.ndarray) -> None:
        # numpy in, device placement follows the (committed, sharded) state
        # arrays — keeps all compute on the collection's mesh.
        slots = np.asarray(slots, dtype=np.int32)
        vecs = np.asarray(vecs, dtype=np.float32)
        for start in range(0, len(slots), self.WRITE_CHUNK_ROWS):
            sl = slots[start:start + self.WRITE_CHUNK_ROWS]
            chunk = vecs[start:start + self.WRITE_CHUNK_ROWS]
            if self.has_norms:
                self.x, self.aux, self.norms, self.valid = _write_rows_n(
                    self.x, self.aux, self.norms, self.valid, sl, chunk,
                    metric=self.cfg.metric, packed=self.packed)
            else:
                self.x, self.aux, self.valid = _write_rows(
                    self.x, self.aux, self.valid, sl, chunk,
                    metric=self.cfg.metric, packed=self.packed)

    def write_raw(self, slots: np.ndarray, rows: np.ndarray,
                  aux: np.ndarray) -> None:
        """Scatter stored-representation rows + aux (snapshot restore;
        int8+l2's |x_hat|^2 lane is recomputed in the same scatter, so
        snapshots never carry it)."""
        slots = np.asarray(slots, dtype=np.int32)
        for start in range(0, len(slots), self.WRITE_CHUNK_ROWS):
            sl = slots[start:start + self.WRITE_CHUNK_ROWS]
            rc = rows[start:start + self.WRITE_CHUNK_ROWS]
            ac = aux[start:start + self.WRITE_CHUNK_ROWS]
            if self.has_norms:
                self.x, self.aux, self.norms, self.valid = _write_rows_raw_n(
                    self.x, self.aux, self.norms, self.valid, sl, rc, ac,
                    packed=self.packed)
            else:
                self.x, self.aux, self.valid = _write_rows_raw(
                    self.x, self.aux, self.valid, sl, rc, ac)

    def gather_raw(self, slots: np.ndarray, *, sync: bool = True):
        """Fetch (stored rows, aux) without conversion (snapshot writer).

        On a process-spanning mesh this is a COLLECTIVE program (every
        rank must call it with identical slots in the same order) whose
        replicated output lets each rank read the full chunk locally.

        ``sync=False`` returns the (immutable) jax arrays right after
        DISPATCH without the device->host readback: the collective
        snapshot holds its agreed write lock only across the dispatch and
        reads the bytes back after releasing it (jax arrays are immutable,
        so a later donated mutation cannot corrupt an in-flight gather —
        the runtime orders it after)."""
        slots = np.asarray(slots, dtype=np.int32)
        if self.multiprocess:
            g = _replicated_gather(_mesh_key(self.mesh))
            rows, auxv = g(self.x, self.aux, slots)
        else:
            rows = self.x[slots]
            auxv = self.aux[slots]
        if not sync:
            return rows, auxv
        return np.asarray(rows), np.asarray(auxv)

    def erase(self, slots: np.ndarray) -> None:
        self.valid = _erase_rows(self.valid, np.asarray(slots, dtype=np.int32))

    def rebuild_norms(self) -> None:
        """Recompute the int8+l2 |x_hat|^2 lane from x+aux in one device
        pass. REQUIRED after writing ``self.x``/``self.aux`` directly
        (bench/experiment harnesses fill on-device to skip the host link);
        the normal mutation paths (write/write_raw/move) maintain the lane
        themselves. No-op for other configs."""
        if self.has_norms:
            self.norms = _rebuild_norms(self.x, self.aux, self.norms,
                                        packed=self.packed)

    def move(self, src: np.ndarray, dst: np.ndarray) -> None:
        if len(src) == 0:
            return
        src = np.asarray(src, dtype=np.int32)
        dst = np.asarray(dst, dtype=np.int32)
        if self.has_norms:
            self.x, self.aux, self.norms, self.valid = _move_rows_n(
                self.x, self.aux, self.norms, self.valid, src, dst)
        else:
            self.x, self.aux, self.valid = _move_rows(
                self.x, self.aux, self.valid, src, dst)

    # -- reads -------------------------------------------------------------

    def filter_mask_from_slots(self, slots: np.ndarray, *,
                               mode: str = "within"):
        """Build a device filter mask from slot indices.

        ``within``: True only at ``slots`` (allowlist); ``exclude``: False at
        ``slots`` (denylist). The mask is data, not program: every batch
        shape reuses the already-compiled search program — filtering is one
        fused elementwise AND in front of the same masked scan the delete
        bitmap already performs (deleted slots stay masked either way).

        The scatter is compiled once per (mesh, capacity, mode, bucketed
        slot count): slot lists pad to power-of-two buckets with the
        out-of-range index ``capacity`` (dropped by the scatter), so
        arbitrary filter sizes reuse a handful of programs.
        """
        if mode not in ("within", "exclude"):
            raise ValueError(f"Unknown filter mode {mode!r}")
        slots = np.asarray(slots, dtype=np.int64).reshape(-1)
        base = mode == "exclude"  # allowlist starts False, denylist True
        n = max(1, 1 << (int(slots.size) - 1).bit_length()) \
            if slots.size else 1
        if n != slots.size:
            slots = np.concatenate(
                [slots, np.full(n - slots.size, self.capacity, np.int64)])
        build = _mask_builder(_mesh_key(self.mesh), self.capacity, base)
        return build(slots)

    def gather(self, slots: np.ndarray) -> np.ndarray:
        """Fetch rows (f32) for exact-lookup SEARCH (dequantized for
        int8/int4)."""
        slots = np.asarray(slots, dtype=np.int32)
        if self.dtype == jnp.int8:
            return np.asarray(_gather_rows_dequant(
                self.x, self.aux, slots, packed=self.packed))
        return np.asarray(_gather_rows(self.x, slots))

    def search(self, queries: np.ndarray, k: int, *, precision=None,
               impl=None, rescore=None, as_numpy=True, margin=None,
               filter_mask=None):
        """Exact top-k. Returns (values (B, k) f32, slots (B, k) i32) numpy.

        ``as_numpy=False`` returns device arrays without forcing a
        device->host sync — used by throughput harnesses to pipeline
        batches (each host readback costs a full interconnect round trip).

        ``filter_mask`` (bool (capacity,), from ``filter_mask_from_slots``)
        restricts the scan to ``valid & filter``: filtered searches run the
        same compiled program, with masked-out rows scored -inf exactly like
        deleted slots.
        """
        precision = precision or self.precision
        impl_arg = impl
        rescore = self.rescore if rescore is None else rescore
        if isinstance(queries, jax.Array):
            # Pre-staged device queries: no host round trip, pad on device.
            q = queries.astype(jnp.float32)
            if q.ndim == 1:
                q = q[None, :]
        else:
            q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        B, dim = q.shape
        if dim != self.cfg.dim:
            raise ValueError(f"Query dim {dim} != collection dim {self.cfg.dim}")
        if k < 1:
            raise ValueError("k must be >= 1")
        k = min(k, MAX_K, self.capacity)
        Bp = _bucket(B, BATCH_BUCKETS)
        impl = impl_arg or self.impl
        if (impl_arg is None and impl == "pallas" and Bp <= 8
                and self.capacity * self.storage_dim
                * self.dtype.itemsize <= (32 << 20)):
            # Small-batch, small-collection searches dodge the kernel's
            # ~1 ms Mosaic while-entry: the XLA scan path measured faster
            # at B <= 8 up to ~32 MB of rows (kexp10: 2.58 vs 2.75 ms at
            # 100k x 128 batch 1 — beats one CPU core at 3.49 ms), while
            # the fused kernel wins 3x+ at 1M x 768.
            impl = "scan"
        # Clamp the bucketed output width to capacity: rescore's top_k runs
        # on (B, k_scan<=capacity) candidates, so k_out may never exceed it
        # (tiny collections with k near capacity crashed otherwise).
        k_out = min(_bucket(k, K_BUCKETS), self.capacity)
        # Candidate margin: slack for fast-precision ordering jitter that
        # the exact rescore recovers from. Scales mildly with k (a larger k
        # puts the rank boundary in a denser score band). An explicit
        # ``margin=`` overrides the policy (tuning/validation harnesses).
        if margin is None:
            # bf16/f32 fast-precision rank jitter measured <= 4 ranks for
            # k <= 100 at 1M x 768 on v5e (experiments/recall_margin.py,
            # re-confirmed by kexp8: margin 4 held recall 1.0), so the
            # default 8 is 2x safety with no k-scaling tax in the MEASURED
            # band (k_out <= 100); the k/8 floor stays beyond it.
            margin = max(self.cfg.rescore_margin,
                         k_out // 8 if k_out > 100 else 0) if rescore else 0
            if self.dtype == jnp.int8 and rescore:
                # Quantization (rows AND query) adds rank jitter beyond
                # bf16/f32: kexp8 measured margin 6 MISSING occasionally at
                # k=100 (recall 0.9975-0.99875) while margin 8 held 1.0 —
                # default 12 is 1.5x the proven-safe value. The bench's
                # on-device probe re-verifies recall on every run.
                margin = max(margin, 12, k_out // 4 if k_out > 100 else 0)
        elif not rescore:
            margin = 0
        k_scan = min(k_out + margin, self.capacity)
        if Bp != B:
            if isinstance(q, jax.Array):
                q = jnp.pad(q, ((0, Bp - B), (0, 0)))
            else:
                q = np.concatenate([q, np.zeros((Bp - B, dim), np.float32)])
        block_rows = _pick_block_rows(self.rows_local, self.cfg.segment_rows)
        # The theta0 kill switch is part of the program-cache key: it is
        # baked in at trace time, so toggling the env var must reach a
        # different compiled program, not silently hit the old one.
        import os
        # Default "count" (round 5): kexp19's A/B/A hardware bracket was a
        # wash (k=16: 52.97/53.1/53.0 kQPS; k=100: 30.48/30.44/30.49), so
        # the EXACT radix-lift k-th sub-max wins on principle at zero cost —
        # a provably tighter floor than approx_max_k's recall-0.95 top-k
        # (which can drop true sub-maxima), and the soundness argument
        # carries no approximation. approx stays one env var away.
        theta0_method = os.environ.get("VROD_THETA0_METHOD", "count")
        if theta0_method not in ("approx", "count", "minmax", "topk"):
            # A typo here would otherwise silently pick SOME method (and
            # before round 4 silently fell back to approx) — the floor is
            # a measured perf lever, so misconfiguration must be loud.
            raise ValueError(
                f"VROD_THETA0_METHOD={theta0_method!r}: expected "
                f"approx|count|minmax|topk")
        fn = _search_fn(
            _mesh_key(self.mesh), Bp, k_out, k_scan, self.cfg.metric,
            precision, self.cfg.dtype, self.rows_local, block_rows,
            self.shards, bool(rescore), impl,
            os.environ.get("VROD_THETA0", "1") != "0",
            float(os.environ.get("VROD_THETA0_MARGIN", "1e-3")),
            int(os.environ.get("VROD_THETA0_FRAC", "8")),
            theta0_method,
            # Pre-pass block: 0 = auto (largest of 16384/8192 that keeps
            # the floor gate open — fewer sub-maxima cut the approx_max_k
            # threshold cost; kexp16: +2.1% at 1M top-100). A numeric
            # value forces that block size.
            int(os.environ.get("VROD_THETA0_BLK", "0")),
            # Floor active from k_scan 24 up (covers top-16 after margin;
            # measured +2.6% there with the auto-shrunk sample).
            int(os.environ.get("VROD_THETA0_MINK", "24")))
        valid = self.valid if filter_mask is None \
            else _and_masks(self.valid, filter_mask)
        if self.has_norms:
            vals, idx = fn(self.x, self.aux, self.norms, valid, q)
        else:
            vals, idx = fn(self.x, self.aux, valid, q)
        if not as_numpy:
            return vals[:B, :k], idx[:B, :k]
        # device_get starts BOTH host copies async before blocking, so the
        # two transfers overlap into ~one interconnect round trip. Through
        # the dev tunnel one readback costs ~25 ms RTT — sequential
        # np.asarray(vals); np.asarray(idx) paid it twice, and this sync is
        # the serving path's dominant per-tile cost (the 262k-row scan
        # itself is ~1 ms).
        return jax.device_get((vals[:B, :k], idx[:B, :k]))

