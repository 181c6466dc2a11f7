"""Sharded embedding collection: fused multi-table storage + distributed
pooled lookup over a (data, model) mesh.

This is the TPU re-design of the reference host runtime's job
(emb_host.h: populate_mram shards tables onto DPUs; lookup broadcasts
indices, launches, and merges per-column int32 results via post_process):

  reference (UPMEM)                          here (TPU)
  ----------------------------------------  -------------------------------
  one DPU per (table, column)                (data, model) mesh; per-policy
    (emb_host.h:157,167)                       NamedSharding on fused storage
  populate_mram per-column host->MRAM DMA    jax.device_put against the
    (emb_host.h:136-183)                       sharding (one shot, no loop)
  indices broadcast to a table's DPUs        queries replicated over model,
    (emb_host.h:258-263)                       sharded over data (batch DP)
  sync dpu_launch + result pull + /1e9       one jitted shard_map: local
    transpose merge (emb_host.h:297-321,      gather+pool then psum (ROW/
    186-222)                                   TABLE_WISE) or dim-concat
                                               all-gather (COLUMN)

Queries use the dense padded form: indices and mask of shape [T, B*L]
(B*L entries per table, row-major over (batch, slot)) — the same contract
as the reference's MAX_INDICES_PER_BATCH padding (emb_host.h:30,258-263) —
so batches shard cleanly and XLA sees fully static shapes.

Why 2-D and not [T, B, L]: TPU arrays tile their last two dims to (8, 128)
sublanes x lanes; a trailing L=1 dim physically inflates the buffer 128x in
HBM (measured: a trivial elementwise add on [26, 8192, 1] int32 cost 1.5ms
— more than the entire 33M-row gather).  The flat [T, B*L] form stays
compact at the jit boundary; kernels reshape internally where XLA fuses it
away.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ShardingPolicy, TableConfig
from .mesh import DATA_AXIS, MODEL_AXIS, check_vma_enabled
from .planner import FusedLayout, plan


@dataclasses.dataclass(frozen=True)
class EmbeddingCollection:
    """A set of same-dim embedding tables fused into one sharded array.

    Usage:
        coll = EmbeddingCollection.create(tables, mesh, policy)
        fused = coll.init(key)                      # sharded [total_rows, D]
        pooled = coll.lookup(fused, idx, mask)      # [B, T, D]
    """

    layout: FusedLayout
    mesh: Mesh

    @staticmethod
    def create(
        tables: Sequence[TableConfig],
        mesh: Mesh,
        policy: ShardingPolicy = ShardingPolicy.AUTO,
        *,
        packed: bool | str = False,
    ) -> "EmbeddingCollection":
        """``packed``: lane-pack storage for dim<128 (see FusedLayout.pack).
        False (default) | True (error if unsupported) | "auto"."""
        num_shards = mesh.shape[MODEL_AXIS]
        return EmbeddingCollection(plan(tables, num_shards, policy, packed), mesh)

    # -- storage ------------------------------------------------------------

    @property
    def table_sharding(self) -> NamedSharding:
        if self.layout.policy == ShardingPolicy.COLUMN:
            return NamedSharding(self.mesh, P(None, MODEL_AXIS))
        if self.layout.policy == ShardingPolicy.REPLICATE:
            return NamedSharding(self.mesh, P())
        return NamedSharding(self.mesh, P(MODEL_AXIS, None))  # ROW / TABLE_WISE

    def init(self, key: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Initialize the fused table, laid out directly into its sharding.

        Per-table uniform(-1/sqrt(n), 1/sqrt(n)) — the dlrm EmbeddingBag
        init convention the reference's model layer quantises from
        (SURVEY.md §3.3).  jit with out_shardings creates each shard on its
        owning device: the analog of populate_mram's per-DPU pushes without
        ever materialising the full table on one host.

        The per-row scale is computed in-kernel from tiny [T] constants
        (searchsorted over table end-rows) — never materialize a
        [total_rows, 1] array: trailing-dim-1 buffers relayout
        catastrophically on TPU (measured: one such array degrades every
        subsequent HBM gather in the process ~150x).
        """
        ends, scales = self._sorted_table_ends()
        lay = self.layout
        pack, dim = lay.pack, lay.dim
        strided = lay.policy == ShardingPolicy.ROW_HASH
        m = lay.num_shards
        srows_per_shard = lay.rows_per_shard // pack

        def slab_vals(k, row0, nrows):
            # generate in f32, cast once at the end — low-precision uniform/
            # searchsorted compile poorly and lose init quality
            shape = (nrows, lay.storage_width)
            u = jax.random.uniform(k, shape, jnp.float32, -1.0, 1.0)
            # fused id of storage position (q, l): shard s = q // (rps/pack),
            # owner-local row j = (q % (rps/pack))*pack + l//dim; contiguous
            # layouts map j back as g = s*rps + j, strided (ROW_HASH) as
            # g = j*m + s.  All fully fused elementwise — nothing
            # materializes besides u.
            q = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            s = q // srows_per_shard
            j = (q % srows_per_shard) * pack + lane // dim
            frow = j * m + s if strided else s * lay.rows_per_shard + j
            tid = jnp.searchsorted(
                jnp.asarray(ends), frow.reshape(-1), side="right"
            ).reshape(shape)
            scale = jnp.take(
                jnp.asarray(scales, dtype=jnp.float32),
                jnp.minimum(tid, len(lay.table_rows) - 1),
            )
            return (u * scale).astype(dtype)

        # Big tables init in row slabs: the f32/i32 intermediates above are
        # ~3x the f32 table size, which OOMs compile at >=8GB tables
        # (measured: 32 x 1M x dim64 wants 23GB of 15.75GB HBM).  Slabbed,
        # transients stay ~3GB while the output lands at final dtype.
        slab = _INIT_SLAB_ROWS * 128 // lay.storage_width
        if lay.storage_rows <= slab:
            fn = lambda k: slab_vals(k, jnp.int32(0), lay.storage_rows)
            return jax.jit(fn, out_shardings=self.table_sharding)(key)

        nslabs = -(-lay.storage_rows // slab)

        def make(k):
            def body(i, out):
                row0 = jnp.minimum(i * slab, lay.storage_rows - slab)
                vals = slab_vals(jax.random.fold_in(k, i), row0, slab)
                return jax.lax.dynamic_update_slice(out, vals, (row0, 0))

            out0 = jnp.zeros((lay.storage_rows, lay.storage_width), dtype)
            return jax.lax.fori_loop(0, nslabs, body, out0)

        return jax.jit(make, out_shardings=self.table_sharding)(key)

    def _sorted_table_ends(self) -> tuple[np.ndarray, np.ndarray]:
        """(end_row, 1/sqrt(rows)) per table, sorted by fused offset (the
        TABLE_WISE bin-packed layout is not offset-ordered by table id)."""
        pairs = sorted(
            (off + rows, 1.0 / np.sqrt(rows))
            for off, rows in zip(self.layout.row_offsets, self.layout.table_rows)
        )
        ends = np.asarray([p[0] for p in pairs], dtype=np.int32)
        scales = np.asarray([p[1] for p in pairs], dtype=np.float32)
        return ends, scales

    def fused_host_array(self, host_tables: Sequence[np.ndarray]) -> np.ndarray:
        """Per-table host weights -> the fused [storage_rows, storage_width]
        numpy array in this layout's storage order (ROW_HASH striding and
        lane packing applied).  Shared by the single-host device_put path
        and the multi-process path (multihost.device_put_tables)."""
        lay = self.layout
        fused = np.zeros((lay.total_rows, lay.dim), np.float32)
        for arr, off, rows in zip(
            host_tables, lay.row_offsets, lay.table_rows
        ):
            if arr.shape != (rows, lay.dim):
                raise ValueError(f"table shape {arr.shape} != {(rows, lay.dim)}")
            fused[off : off + rows] = arr
        if lay.policy == ShardingPolicy.ROW_HASH:
            # strided placement: shard s's local row j holds fused row j*m+s
            m, rps = lay.num_shards, lay.rows_per_shard
            perm = (
                np.arange(rps)[None, :] * m + np.arange(m)[:, None]
            ).reshape(-1)
            fused = fused[perm]
        return fused.reshape(lay.storage_rows, lay.storage_width)

    def device_put_tables(self, host_tables: Sequence[np.ndarray]) -> jax.Array:
        """Load pre-existing per-table weights (populate_mram parity path,
        emb_host.h:136: host pushes externally-built table data)."""
        fused = self.fused_host_array(host_tables)
        return jax.device_put(jnp.asarray(fused), self.table_sharding)

    def unfuse_host(self, fused) -> list[np.ndarray]:
        """Inverse of fused_host_array: fused storage (device array or
        numpy, [storage_rows, storage_width]) -> per-table [rows, dim]
        numpy weights in original table order, undoing lane packing and
        ROW_HASH striding.  The model-export path (trained fused table ->
        per-table weights for quantize-for-serving or external tooling)."""
        lay = self.layout
        arr = np.asarray(fused).reshape(-1, lay.dim)  # [total_rows, dim]
        if lay.policy == ShardingPolicy.ROW_HASH:
            m, rps = lay.num_shards, lay.rows_per_shard
            perm = (
                np.arange(rps)[None, :] * m + np.arange(m)[:, None]
            ).reshape(-1)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(perm.size)
            arr = arr[inv]
        return [
            arr[off : off + rows]
            for off, rows in zip(lay.row_offsets, lay.table_rows)
        ]

    # -- query globalization ------------------------------------------------

    def globalize(self, indices: jax.Array) -> jax.Array:
        """Per-table local ids [T, C] -> fused row ids."""
        offs = jnp.asarray(self.layout.row_offsets, dtype=indices.dtype)
        return indices + offs[:, None]

    # -- lookup -------------------------------------------------------------

    def lookup(
        self,
        fused_table: jax.Array,
        indices: jax.Array,
        mask: jax.Array,
        *,
        batch_size: int | None = None,
        combiner: str = "sum",  # "sum" | "mean" | "max"
    ) -> jax.Array:
        """Pooled lookup (SUM default; MEAN/MAX for torch-EmbeddingBag API
        parity — the reference hardwires SUM, emb_dpu_lookup.c:114).

        indices: [T, B*L] per-table row ids (local, not fused);
        mask:    [T, B*L] validity;
        batch_size: B (default: infer L=1, B = C);
        returns  [B, T, D] pooled vectors (the reference's final_results
        layout after post_process's col->row transpose, emb_host.h:207-212).
        Empty bags pool to 0 (all combiners), matching torch.
        """
        t, c = indices.shape
        b = batch_size if batch_size is not None else c
        if c % b:
            raise ValueError(f"capacity {c} not divisible by batch {b}")
        g_idx = self.globalize(indices)
        pooled = _lookup_dispatch(
            self.mesh,
            self.layout.policy,
            self.layout.rows_per_shard,
            c // b,
            self.layout.pack,
            self.layout.policy == ShardingPolicy.ROW_HASH,
            combiner,
            _use_pallas_gather(
                fused_table, self.layout.pack,
                self.layout.storage_width, combiner,
            ),
            fused_table,
            g_idx,
            mask,
        )
        if combiner == "sum":
            return pooled
        return _finish_combiner(combiner, c // b, pooled, mask)

    @property
    def _strided(self) -> bool:
        return self.layout.policy == ShardingPolicy.ROW_HASH


    def lookup_csr(
        self,
        fused_table: jax.Array,
        indices: jax.Array,  # [T, C] flat per-table ids, padded
        offsets: jax.Array,  # [T, B+1] bag offsets ([T, Nd*(Bd+1)] sharded)
        *,
        combiner: str = "sum",  # "sum" | "mean" | "max"
        data_sharded: bool = False,
        routed: bool = False,
        capacity_factor: float | None = None,
        return_stats: bool = False,
    ) -> jax.Array | tuple[jax.Array, jax.Array]:
        """Pooled lookup over ragged (CSR) bags — the reference's exact
        API shape (emb_host.h:234 ``lookup(uint32_t **indices, uint32_t
        **offsets, ...)``) generalized over the mesh, with the full
        torch-EmbeddingBag combiner set (reference hardwires SUM,
        emb_dpu_lookup.c:114).

        Unlike ``lookup`` (fixed pooling L), bags have arbitrary lengths
        encoded in offsets; pooling is a segment reduce per table.  Empty
        bags pool to 0 for every combiner (torch parity).

        ``data_sharded=False`` (default): offsets [T, B+1], one CSR stream,
        batch replicated over the data axis.

        ``data_sharded=True``: PER-SHARD CSR with fixed per-shard capacity —
        the DP serving form.  indices [T, Nd*Cd] and offsets
        [T, Nd*(Bd+1)] are both sharded over the data axis on dim 1: data
        shard d holds its own Cd-entry buffer and its own (Bd+1) offsets
        RELATIVE to that buffer (build with ops.ragged.shard_csr).  Output
        [Nd*Bd, T, D] is batch-sharded like the dense form.

        ``routed=True`` (ROW/ROW_HASH/TABLE_WISE, SUM/MEAN): the ragged
        entries ride the all-to-all ID-ROUTING path (see ``lookup_routed``)
        instead of the ownership-masked broadcast — per-device gather
        issues drop from E to ~cf*E/M, so the reference's native wire shape
        (emb_host.h:234) gets multi-chip ISSUE-RATE scaling, not just
        capacity.  Drop semantics are identical to ``lookup_routed``:
        impossible at the default ``capacity_factor=None`` (resolves to
        ``safe_capacity_factor``), counted in-graph below it — pass
        ``return_stats=True`` for ``(pooled, dropped)``.  MEAN at an
        explicit low cf divides by the FULL bag length (dropped entries
        contribute zero to the sum but still count in the denominator).
        """
        t, c = indices.shape
        nd = self.mesh.shape[DATA_AXIS] if data_sharded else 1
        if c % nd or offsets.shape[1] % nd:
            raise ValueError(
                f"data_sharded CSR needs data axis {nd} to divide capacity "
                f"{c} and offsets width {offsets.shape[1]}"
            )
        if return_stats and not routed:
            raise ValueError("return_stats requires routed=True (the "
                             "broadcast CSR path cannot drop entries)")
        b_local = offsets.shape[1] // nd - 1
        g_idx = self.globalize(indices)
        if routed:
            if not _rowish(self.layout.policy):
                raise ValueError(
                    "routed lookup_csr requires ROW/ROW_HASH/TABLE_WISE"
                )
            if combiner not in ("sum", "mean"):
                raise ValueError("routed lookup_csr supports sum/mean")
            pooled, dropped = _lookup_csr_routed_dispatch(
                self.mesh,
                self.layout.rows_per_shard,
                b_local,
                self.layout.pack,
                self._resolve_cf(capacity_factor),
                self.layout.policy == ShardingPolicy.ROW_HASH,
                data_sharded,
                fused_table,
                g_idx,
                offsets.astype(jnp.int32),
            )
            if combiner == "mean":
                pooled = _csr_mean_divide(pooled, offsets, nd)
            if return_stats:
                return pooled, jnp.sum(dropped)
            return pooled
        return _lookup_csr_dispatch(
            self.mesh,
            self.layout.policy,
            self.layout.rows_per_shard,
            b_local,
            self.layout.pack,
            self.layout.policy == ShardingPolicy.ROW_HASH,
            combiner,
            data_sharded,
            fused_table,
            g_idx,
            offsets.astype(jnp.int32),
        )

    @property
    def safe_capacity_factor(self) -> float:
        """Smallest capacity factor that makes routed drops IMPOSSIBLE.

        cf = num_shards gives per-(src, dst) buckets of k = E_slice entries:
        even if every entry in a device's slice is owned by one shard (the
        worst case — contiguous ROW ownership skew, or a zipf stream whose
        duplicates of one hot id all hash to one owner), nothing overflows.
        This is the API default.

        BE EXPLICIT about what the default buys: exactness, not issue-rate
        scaling.  At cf = M the buckets are worst-case sized, so each shard
        still processes ~E slots (mostly empty sentinels — but gather cost
        is per-ISSUE, docs/PERF.md).  The ~cf*E/M per-shard issue reduction
        — the point of routing, pinned in compiled HLO by
        tools/routed_hlo_audit.py — belongs to the EXPLICIT low-cf mode
        (e.g. cf=2 under ROW_HASH, where distinct ids spread ~uniformly):
        production multi-chip serving runs low cf + hot-row cache (which
        removes the hot-duplicate overflow pressure) + drop counters.
        """
        return float(self.layout.num_shards)

    def _resolve_cf(self, capacity_factor: float | None) -> float:
        if capacity_factor is None:
            return self.safe_capacity_factor
        return float(capacity_factor)

    def lookup_routed(
        self,
        fused_table: jax.Array,
        indices: jax.Array,  # [T, B*L] local (per-table) ids
        mask: jax.Array,  # [T, B*L]
        *,
        batch_size: int | None = None,
        capacity_factor: float | None = None,
        hot_cache: tuple[jax.Array, jax.Array] | None = None,
        return_stats: bool = False,
        combiner: str = "sum",  # "sum" | "mean" (max: broadcast path only)
    ) -> jax.Array | tuple[jax.Array, jax.Array]:
        """Pooled SUM/MEAN lookup with all-to-all ID ROUTING (ROW/TABLE_WISE).

        The default ``lookup`` broadcasts every query to every model shard
        and masks by ownership — simple, but each shard still issues the
        full C gathers, so model sharding buys table CAPACITY, not lookup
        throughput (gathers are issue-rate bound).  This variant is the
        SURVEY.md §2c design: entries are split over the model axis, each
        device routes its slice to the owning shards through a
        capacity-bucketed all_to_all (the TPU analog of the reference
        broadcasting indices to a table's DPUs, emb_host.h:258-263), each
        shard gathers only the ~E/M ids it owns, rows ride an all_to_all
        back, and pooled partials psum-merge.  Per-device gather issues
        drop from E to ~cf*E/M — true multi-chip lookup scaling.

        ``capacity_factor``: each (src, dst) bucket holds
        ceil(cf * E_slice / M) entries.  ``None`` (default) resolves to
        ``safe_capacity_factor`` — drops are impossible and results are
        exact for every rowish policy and any id distribution (the
        reference's indices broadcast never loses entries, emb_host.h:
        258-263; neither does the default here).  An explicit lower cf is
        the throughput mode (e.g. 2.0 under ROW_HASH with de-duplicated or
        uniform streams): bucket overflow then DROPS entries (they
        contribute zero to the pooled sum) — always counted in-graph;
        pass ``return_stats=True`` to get ``(pooled, dropped)`` where
        ``dropped`` is the global count of dropped entries this call.
        MEAN at an explicit low cf divides by the FULL masked bag size
        (counts come from the replicated mask, which cannot see routing
        overflow), so a bag with dropped entries biases low — it is
        neither 'mean of kept entries' nor broadcast parity.  At the
        default cf there are no drops and MEAN is exact.

        ``hot_cache``: optional (hot_ids [K] sorted, hot_rows [K, D])
        replicated snapshot (parallel/hotcache.py).  Hot entries are
        served locally from the replica and EXCLUDED from routing — the
        RecShard-style fix for zipf hotspots (SURVEY §7 hard part (c)),
        which also removes the hot-duplicate overflow pressure at low cf.
        """
        if not _rowish(self.layout.policy):
            raise ValueError(
                "lookup_routed requires ROW/ROW_HASH/TABLE_WISE sharding"
            )
        if combiner not in ("sum", "mean"):
            # MAX cannot ride the additive psum partial merge (bag entries
            # for one bag pool on different source devices); use the
            # broadcast ``lookup(..., combiner="max")`` path instead.
            raise ValueError("lookup_routed supports sum/mean combiners")
        t, c = indices.shape
        b = batch_size if batch_size is not None else c
        if c % b:
            raise ValueError(f"capacity {c} not divisible by batch {b}")
        g_idx = self.globalize(indices)
        cf = self._resolve_cf(capacity_factor)
        if hot_cache is None:
            pooled, dropped = _lookup_routed_dispatch(
                self.mesh,
                self.layout.rows_per_shard,
                c // b,
                self.layout.pack,
                cf,
                self.layout.policy == ShardingPolicy.ROW_HASH,
                fused_table,
                g_idx,
                mask,
            )
        else:
            hot_ids, hot_rows = hot_cache
            pooled, dropped = _lookup_routed_hot_dispatch(
                self.mesh,
                self.layout.rows_per_shard,
                c // b,
                self.layout.pack,
                cf,
                self.layout.policy == ShardingPolicy.ROW_HASH,
                fused_table,
                g_idx,
                mask,
                hot_ids,
                hot_rows,
            )
        if combiner == "mean":
            pooled = _finish_combiner("mean", c // b, pooled, mask)
        if return_stats:
            return pooled, jnp.sum(dropped)
        return pooled


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "policy", "rows_per_shard", "batch", "pack", "strided",
        "combiner", "data_sharded",
    ),
)
def _lookup_csr_dispatch(
    mesh, policy, rows_per_shard, batch, pack, strided, combiner,
    data_sharded, fused_table, g_idx, offsets
):
    q_spec = P(None, DATA_AXIS) if data_sharded else P()
    bdim = DATA_AXIS if data_sharded else None
    if policy == ShardingPolicy.COLUMN:
        fn = shard_map(
            functools.partial(
                _csr_pooled_lookup, batch, None, pack, False, 1, combiner
            ),
            mesh=mesh,
            in_specs=(_tspec(fused_table, P(None, MODEL_AXIS), P()),
                      q_spec, q_spec),
            out_specs=P(bdim, None, MODEL_AXIS),
            check_vma=check_vma_enabled(),
        )
        return fn(fused_table, g_idx, offsets)
    if policy == ShardingPolicy.REPLICATE:
        fn = shard_map(
            functools.partial(
                _csr_pooled_lookup, batch, None, pack, False, 1, combiner
            ),
            mesh=mesh,
            in_specs=(_tspec(fused_table, P(), P()), q_spec, q_spec),
            out_specs=P(bdim, None, None),
            check_vma=check_vma_enabled(),  # identical on all shards by construction
        )
        return fn(fused_table, g_idx, offsets)
    local = functools.partial(
        _csr_pooled_lookup, batch, rows_per_shard, pack, strided,
        mesh.shape[MODEL_AXIS], combiner,
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(_tspec(fused_table, P(MODEL_AXIS, None), P(MODEL_AXIS)),
                  q_spec, q_spec),
        out_specs=P(bdim, None, None),
        check_vma=check_vma_enabled(),
    )
    return fn(fused_table, g_idx, offsets)


def _csr_pooled_lookup(batch, rows_per_shard, pack, strided, num_shards,
                       combiner, table_shard, g_idx, offsets):
    """[rows, D], [T, C], [T, B+1] -> [B, T, D] segment-pooled lookup.

    Per-device body: offsets are LOCAL to this device's entry window (the
    data_sharded contract) or global (replicated form — same thing at
    nd=1).  The per-entry bag walk of the reference DPU kernel
    (emb_dpu_lookup.c:106-116) becomes boundary-scatter + cumsum segment
    ids (ops/ragged.py — an earlier searchsorted formulation cost as much
    as the reduce itself; kernel_lab --only csrseg has the burial) feeding
    a sorted segment reduce, which lands within 4-15% of the dense
    fixed-L floor on TPU.
    """
    from ..ops.ragged import segment_ids_from_offsets

    t, c = g_idx.shape
    seg = jax.vmap(lambda o: segment_ids_from_offsets(o, c))(offsets)
    seg = seg.astype(jnp.int32)
    valid = seg < batch
    if rows_per_shard is not None:
        shard = jax.lax.axis_index(MODEL_AXIS)
        owner, local = _owner_local(
            g_idx, rows_per_shard, num_shards, strided
        )
        owned = (owner == shard) & (local < rows_per_shard) & valid
        local = jnp.where(owned, local, 0)
    else:
        local = g_idx
        owned = valid
    rows = _gather_f32(table_shard, local.reshape(-1), pack)
    owned_f = owned.reshape(-1)
    # fused segment ids: table t bag b -> t*(batch+1)+b
    tid = jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)
    fseg = (tid * (batch + 1) + jnp.minimum(seg, batch)).reshape(-1)
    if combiner == "max":
        rows = jnp.where(owned_f[:, None], rows, _NEG_INF)
        pooled = jax.ops.segment_max(
            rows, fseg, num_segments=t * (batch + 1), indices_are_sorted=True
        )
    else:
        rows = rows * owned_f[:, None].astype(rows.dtype)
        pooled = jax.ops.segment_sum(
            rows, fseg, num_segments=t * (batch + 1), indices_are_sorted=True
        )
    pooled = pooled.reshape(t, batch + 1, -1)[:, :batch, :]
    pooled = jnp.transpose(pooled, (1, 0, 2))
    if rows_per_shard is not None:
        pooled = (
            jax.lax.pmax(pooled, MODEL_AXIS) if combiner == "max"
            else jax.lax.psum(pooled, MODEL_AXIS)
        )
    if combiner == "sum":
        return pooled
    # bag sizes from the offsets themselves (valid entries only by contract)
    counts = (offsets[:, 1:] - offsets[:, :-1]).astype(pooled.dtype)  # [T, B]
    counts = jnp.transpose(counts, (1, 0))[..., None]  # [B, T, 1]
    if combiner == "mean":
        return pooled / jnp.maximum(counts, 1)
    return jnp.where(counts > 0, pooled, 0.0)  # max: empty bags -> 0


def _rowish(policy):
    return policy in (
        ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE
    )


def _owner_local(g, rows_per_shard, num_shards, strided):
    """(owner shard, owner-local row id) for fused ids ``g``.

    Contiguous (ROW/TABLE_WISE): owner = g // rows_per_shard.
    Strided (ROW_HASH):          owner = g % num_shards, local = g // num_shards
    — hashes every table's rows across all shards, fixing the ownership
    skew of layout-contiguous sharding (small tables otherwise land wholly
    on one shard; SURVEY.md §7 hard part (c))."""
    if strided:
        return g % num_shards, g // num_shards
    owner = g // rows_per_shard
    return owner, g - owner * rows_per_shard


def _finish_combiner(combiner, pooling, pooled, mask):
    """Post-merge MEAN/MAX finalization on [B, T, D] (counts from the
    replicated mask, so it runs outside the shard_map)."""
    t, c = mask.shape
    counts = mask.reshape(t, c // pooling, pooling).sum(axis=-1)  # [T, B]
    counts = jnp.transpose(counts, (1, 0))[..., None]  # [B, T, 1] (fused)
    if combiner == "mean":
        return pooled / jnp.maximum(counts, 1)
    # max: shards contribute -inf for non-owned entries; empty bags -> 0
    return jnp.where(counts > 0, pooled, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "policy", "rows_per_shard", "pooling", "pack", "strided",
        "combiner", "use_pallas",
    ),
)
def _lookup_dispatch(
    mesh, policy, rows_per_shard, pooling, pack, strided, combiner,
    use_pallas, fused_table, g_idx, mask
):
    if policy == ShardingPolicy.REPLICATE:
        fn = shard_map(
            functools.partial(
                _local_pooled_lookup, pooling, pack, combiner, use_pallas
            ),
            mesh=mesh,
            in_specs=(_tspec(fused_table, P(), P()),
                      P(None, DATA_AXIS), P(None, DATA_AXIS)),
            out_specs=P(DATA_AXIS, None, None),
        )
        return fn(fused_table, g_idx, mask)

    if policy == ShardingPolicy.COLUMN:
        fn = shard_map(
            functools.partial(
                _local_pooled_lookup, pooling, pack, combiner, False
            ),
            mesh=mesh,
            in_specs=(
                _tspec(fused_table, P(None, MODEL_AXIS), P()),
                P(None, DATA_AXIS),
                P(None, DATA_AXIS),
            ),
            # output dim stays sharded over model — downstream ops decide
            # when/if to all-gather (XLA inserts it lazily on use).
            out_specs=P(DATA_AXIS, None, MODEL_AXIS),
        )
        return fn(fused_table, g_idx, mask)

    # ROW(_HASH) / TABLE_WISE: ownership-masked local pool + psum merge —
    # the reduce-scatter/all-reduce replacing the host-side post_process
    # merge.
    local = functools.partial(
        _rowshard_pooled_lookup, rows_per_shard, pooling, pack, strided,
        mesh.shape[MODEL_AXIS], combiner, use_pallas,
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            _tspec(fused_table, P(MODEL_AXIS, None), P(MODEL_AXIS)),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS, None, None),
    )
    return fn(fused_table, g_idx, mask)


# Gather-engine selection for full-width rows.  DEFAULT OFF — the XLA
# gather is the production kernel at every measured shape (docs/PERF.md
# "Pallas kernel status"): the r2 snapshot's claim that the pallas row-DMA
# kernel wins 1.26x on full-width f32 rows did NOT reproduce under the
# chain harness at r3 (bigtable 524k-entry call: XLA 6.5-6.7ms vs pallas
# 8.9-9.5ms at both 2M- and 16M-row spans; the r2 reading was a tunnel
# dedup artifact — the same harness also emitted an impossible 16µs/16TB/s
# point).  "on" forces the kernel (parity tests, experiments); "auto"
# enables it on the TPU backend for A/B runs.  Override without code via
# PEL_PALLAS_GATHER=off|on|auto.
# KNOWN LIMIT: pallas_call inside lax.fori_loop fails the remote Mosaic
# compile in this environment (docs/PERF.md rule 4) — in-graph timed loops
# must keep this off for full-width f32 tables.
PALLAS_GATHER = __import__("os").environ.get("PEL_PALLAS_GATHER", "off")

_PALLAS_NBUF = 32  # outstanding row DMAs (measured best at 32-64)


def _use_pallas_gather(table, pack, width, combiner):
    if PALLAS_GATHER == "off":
        return False
    if isinstance(table, dict):  # int8 dict storage: XLA gather only
        return False
    if combiner == "max" or pack != 1 or width != 128:
        return False
    if jnp.dtype(table.dtype) != jnp.float32:
        return False
    if PALLAS_GATHER == "on":
        return True
    return jax.default_backend() == "tpu"


def _pallas_tile_b(bags, pooling):
    """Largest bag tile with unroll e = tile_b*pooling capped at 2048
    (kernel entry loops are python-unrolled; compile time scales with e).
    0 = no valid tile -> fall back to the XLA gather."""
    for tb in (128, 64, 32, 16, 8):
        if bags % tb == 0 and (tb * pooling) % 8 == 0 and tb * pooling <= 2048:
            return tb
    return 0


def _pallas_pool(table, flat_ids, flat_valid, t, c, pooling, tile_b):
    """Fused gather+pool through the pallas row-DMA kernel:
    [rows,128] f32, [T*C] ids/validity -> [B', T, 128]."""
    from ..ops.pallas_lookup import pallas_embedding_bag_fixedl

    bags = t * (c // pooling)
    out = pallas_embedding_bag_fixedl(
        table, table.shape[-1], flat_ids,
        pooling=pooling, batch_size=bags, tile_b=tile_b,
        nbuf=_PALLAS_NBUF, mask=flat_valid,
    )
    return jnp.transpose(out.reshape(t, c // pooling, 128), (1, 0, 2))


def _gather_f32(table, ids, pack):
    """Gather fused rows -> [..., dim] f32, through packed storage if pack>1.

    Packed: fetch the 128-lane storage row ids//pack (one gather issue buys
    pack rows' worth of lanes), then select lane group ids%pack with a
    one-hot contraction — f32 accumulation via preferred_element_type.

    ``table`` may be int8 dict storage (QuantizedEmbeddingCollection):
      * {"q": int8 [srows, width], "scale": f32 [rows]} — per-ROW scale
        mode: gather the int8 row AND its per-fused-row scale, dequantize
        to f32.  The scale take is a SECOND gather issue per entry, which
        doubles the issue-rate-bound cost (docs/PERF.md).
      * {"q": int8 [srows, width]} — per-TABLE scale mode: no "scale" key;
        rows come back in QUANTIZED units (f32 of the int8 codes) and the
        caller folds the per-table scale into the pooled [B, T, D] output
        (QuantizedEmbeddingCollection._apply_tscale) — zero per-entry
        cost, matching the reference's decode-after-pooling
        (emb_host.h:207-212 divides per POOLED value, not per entry).
    Every lookup variant (dense/CSR/routed, all policies) works unchanged
    on either form.  int8 in [-127, 127] is exact in bf16 (8 mantissa
    bits), so the packed one-hot select rides the VPU in bf16 with f32
    accumulation."""
    if isinstance(table, dict):
        q = table["q"]
        scale = table.get("scale")  # None => per-table mode (post-pool)
        if pack == 1:
            rows = jnp.take(q, ids, axis=0).astype(jnp.float32)
        else:
            d = q.shape[-1] // pack
            wide = jnp.take(q, ids // pack, axis=0).astype(jnp.bfloat16)
            g = jax.nn.one_hot(ids % pack, pack, dtype=jnp.bfloat16)
            rows = jnp.einsum(
                "...pd,...p->...d",
                wide.reshape(*ids.shape, pack, d),
                g,
                preferred_element_type=jnp.float32,
            )
        if scale is None:
            return rows
        s = jnp.take(scale, ids)  # [...] f32, per-FUSED-row
        return rows * s[..., None]
    if pack == 1:
        return jnp.take(table, ids, axis=0).astype(jnp.float32)
    d = table.shape[-1] // pack
    rows = jnp.take(table, ids // pack, axis=0)  # [..., pack*d]
    g = jax.nn.one_hot(ids % pack, pack, dtype=rows.dtype)  # [..., pack]
    return jnp.einsum(
        "...pd,...p->...d",
        rows.reshape(*ids.shape, pack, d),
        g,
        preferred_element_type=jnp.float32,
    )


# Per-step budget for the gathered-rows intermediate inside a pooled
# lookup.  XLA does not fuse a big gather into the pooling reduction, so
# [T, Bs*L, row_bytes] materializes in HBM: at multi-hot scale (e.g. 32
# tables x batch 8192 x pooling 120) that is ~16GB -> OOM.  Above the
# budget the lookup scans over bag chunks (static shapes, one compile).
_POOL_CHUNK_BYTES = 256 << 20

# Storage rows per init slab (at width 128): 2M rows x 128 lanes x 4B = 1GB
# of f32 transient per slab in EmbeddingCollection.init.
_INIT_SLAB_ROWS = 2_000_000


def _chunk_bags(pooling, row_bytes, t, c):
    """Pick bags-per-chunk nb (a divisor of B) so one chunk's gathered rows
    stay under budget; returns (num_chunks, nb) or None for no chunking."""
    b = c // pooling
    if t * c * row_bytes <= _POOL_CHUNK_BYTES or b == 1:
        return None
    nb = max(1, _POOL_CHUNK_BYTES // (t * pooling * row_bytes))
    nb = min(b, nb)
    while b % nb:
        nb -= 1
    return b // nb, nb


def _scan_pooled(pool_fn, pooling, row_bytes, g_idx, mask):
    """pool_fn([T, nb*L], [T, nb*L]) -> [nb, T, D]; scans bag chunks."""
    t, c = g_idx.shape
    chunks = _chunk_bags(pooling, row_bytes, t, c)
    if chunks is None:
        return pool_fn(g_idx, mask)
    bb, nb = chunks
    g4 = jnp.transpose(g_idx.reshape(t, bb, nb * pooling), (1, 0, 2))
    m4 = jnp.transpose(mask.reshape(t, bb, nb * pooling), (1, 0, 2))

    def step(carry, gm):
        gi, mi = gm
        return carry, pool_fn(gi, mi)

    _, outs = jax.lax.scan(step, None, (g4, m4))  # [bb, nb, T, D]
    return outs.reshape(bb * nb, t, -1)


def _row_bytes(table, pack):
    del pack  # storage width already includes the pack factor
    if isinstance(table, dict):  # int8 row (+4B per-row scale if present)
        return table["q"].shape[-1] + (4 if "scale" in table else 0)
    return table.shape[-1] * table.dtype.itemsize


def _tspec(table, row_spec, scale_spec):
    """shard_map in_spec for the table argument: a bare PartitionSpec for
    array storage, a matching pytree for int8 dict storage ({"q": rows x
    width like the f32 table, "scale": 1-D per-fused-row when in per-row
    scale mode — absent in per-table mode})."""
    if isinstance(table, dict):
        spec = {"q": row_spec}
        if "scale" in table:
            spec["scale"] = scale_spec
        return spec
    return row_spec


_NEG_INF = -3.0e38  # max-combiner identity


def _pool_rows(rows, active, pooling, combiner):
    """[T, C, D] rows + [T, C] active -> [B', T, D] (sum or masked max)."""
    t, c, d = rows.shape
    if combiner == "max":
        rows = jnp.where(active[..., None], rows, _NEG_INF)
        pooled = rows.reshape(t, c // pooling, pooling, d).max(axis=2)
    else:  # sum (mean divides post-merge)
        rows = rows * active[..., None].astype(rows.dtype)
        pooled = rows.reshape(t, c // pooling, pooling, d).sum(axis=2)
    return jnp.transpose(pooled, (1, 0, 2))


def _local_pooled_lookup(pooling, pack, combiner, use_pallas, table, g_idx,
                         mask):
    """[rows, D], [T, Bs*L], [T, Bs*L] -> [Bs, T, D] dense gather+pool.

    Accumulates in f32 regardless of storage dtype (bf16 tables halve HBM
    traffic; the pool must not lose precision — the analog of the DPU's
    full-width int32 accumulate, emb_dpu_lookup.c:114)."""
    t, c = g_idx.shape
    if use_pallas:
        tb = _pallas_tile_b(t * (c // pooling), pooling)
        if tb:
            # fused in-kernel pooling: no [T, C, D] gather intermediate,
            # so the _scan_pooled chunking is unnecessary here
            return _pallas_pool(
                table, g_idx.reshape(-1), mask.reshape(-1), t, c, pooling, tb
            )

    def pool(gi, mi):
        rows = _gather_f32(table, gi, pack)  # [T, nb*L, D] f32
        return _pool_rows(rows, mi, pooling, combiner)

    return _scan_pooled(pool, pooling, _row_bytes(table, pack), g_idx, mask)


def _rowshard_pooled_lookup(rows_per_shard, pooling, pack, strided,
                            num_shards, combiner, use_pallas, table_shard,
                            g_idx, mask):
    shard = jax.lax.axis_index(MODEL_AXIS)
    t, c = g_idx.shape

    if use_pallas:
        tb = _pallas_tile_b(t * (c // pooling), pooling)
    else:
        tb = 0
    if tb:
        owner, local = _owner_local(g_idx, rows_per_shard, num_shards, strided)
        owned = (owner == shard) & (local < rows_per_shard) & mask
        local = jnp.where(owned, local, 0)
        pooled = _pallas_pool(
            table_shard, local.reshape(-1), owned.reshape(-1), t, c, pooling,
            tb,
        )
        return jax.lax.psum(pooled, MODEL_AXIS)

    def pool(gi, mi):
        owner, local = _owner_local(gi, rows_per_shard, num_shards, strided)
        owned = (owner == shard) & (local < rows_per_shard) & mi
        local = jnp.where(owned, local, 0)
        rows = _gather_f32(table_shard, local, pack)
        return _pool_rows(rows, owned, pooling, combiner)

    pooled = _scan_pooled(
        pool, pooling, _row_bytes(table_shard, pack), g_idx, mask
    )
    if combiner == "max":
        return jax.lax.pmax(pooled, MODEL_AXIS)
    return jax.lax.psum(pooled, MODEL_AXIS)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_per_shard", "pooling", "pack", "cf", "strided"
    ),
)
def _lookup_routed_dispatch(
    mesh, rows_per_shard, pooling, pack, cf, strided, fused_table, g_idx, mask
):
    m = mesh.shape[MODEL_AXIS]
    local = functools.partial(
        _routed_pooled_lookup, rows_per_shard, pooling, pack, cf, m, strided
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            _tspec(fused_table, P(MODEL_AXIS, None), P(MODEL_AXIS)),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
        ),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS)),
    )
    return fn(fused_table, g_idx, mask)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_per_shard", "pooling", "pack", "cf", "strided"
    ),
)
def _lookup_routed_hot_dispatch(
    mesh, rows_per_shard, pooling, pack, cf, strided, fused_table, g_idx,
    mask, hot_ids, hot_rows
):
    m = mesh.shape[MODEL_AXIS]
    local = functools.partial(
        _routed_pooled_lookup, rows_per_shard, pooling, pack, cf, m, strided
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            _tspec(fused_table, P(MODEL_AXIS, None), P(MODEL_AXIS)),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
            P(),
            P(),
        ),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS)),
    )
    return fn(fused_table, g_idx, mask, hot_ids, hot_rows)


def routed_bucket_k(em: int, cf: float, m: int) -> int:
    """Per-(src, dst) routing bucket capacity: ceil(cf * em / m) with a
    floor of 8 (sublane alignment) and a cap of em (one device's whole
    slice).  The SINGLE source of truth for the ~cf*E/M routed-issue claim
    — shared by the fixed-L and CSR lookup routers, the scatter-update
    router (sparse_update.py), and the HLO audit
    (tools/routed_hlo_audit.py), so the audit cannot drift from the
    library (ADVICE r4)."""
    return min(em, max(8, -(-int(cf * em) // m)))


def _slice_entries(mi, m, em, pad, *arrays):
    """Pad flat per-entry arrays to em*m and take device mi's em-slice."""
    out = []
    for a in arrays:
        if pad:
            z = jnp.zeros((pad, *a.shape[1:]), a.dtype)
            a = jnp.concatenate([a, z])
        out.append(jax.lax.dynamic_slice_in_dim(a, mi * em, em))
    return out


def _route_rows(table_shard, gs, vs, *, rows_per_shard, pack, cf, m, strided,
                hot_ids=None, hot_rows=None):
    """Routing core shared by the fixed-L and CSR routed lookups: take this
    device's slice of (fused id, valid) entries, route ids to owner shards
    through capacity-bucketed all_to_alls, gather locally on the owner, and
    ride the rows back.  Returns (rows_e [Em, D] f32 — zeros for invalid or
    overflow-dropped entries, dropped [1] int32 — global drop count, psum'd
    over model; zero by construction at the safe capacity factor)."""
    em = gs.shape[0]
    hot_e = None
    if hot_ids is not None:
        from .hotcache import hot_cache_select

        hit, hot_e = hot_cache_select(hot_ids, hot_rows, gs, vs)
        vs = vs & ~hit  # hot entries served locally, not routed

    owner, local_ids = _owner_local(gs, rows_per_shard, m, strided)
    owner = jnp.clip(owner, 0, m - 1)  # [Em]
    # position of each entry within its destination bucket
    oh = (jax.nn.one_hot(owner, m, dtype=jnp.int32)
          * vs[:, None].astype(jnp.int32))  # [Em, M]
    cum = jnp.cumsum(oh, axis=0) - oh
    pos = jnp.take_along_axis(cum, owner[:, None], axis=1)[:, 0]  # [Em]
    k = routed_bucket_k(em, cf, m)  # bucket cap per (src, dst)
    ok = vs & (pos < k)
    slot = jnp.where(ok, owner * k + pos, m * k)  # oob -> dropped
    dropped = jax.lax.psum(
        jnp.sum(vs & ~ok, dtype=jnp.int32)[None], MODEL_AXIS
    )  # [1]; in-graph drop counter (VERDICT r1 #1 / ADVICE high)

    # dispatch: owner-local row ids, sentinel rows_per_shard for empty slots
    send = jnp.full((m * k,), rows_per_shard, dtype=gs.dtype)
    send = send.at[slot].set(local_ids, mode="drop")
    recv = jax.lax.all_to_all(
        send.reshape(m, k), MODEL_AXIS, split_axis=0, concat_axis=0
    ).reshape(m * k)  # ids I own, one k-block per source device

    rows = _gather_f32(
        table_shard, jnp.minimum(recv, rows_per_shard - 1), pack
    )  # [M*K, D] f32
    rows = rows * (recv < rows_per_shard)[:, None].astype(rows.dtype)
    # Return-trip wire dtype: bf16-stored rows are EXACT in bf16 (gather +
    # one-hot lane select never accumulate — each output element is one
    # stored value or zero), so riding the return all_to_all at storage
    # precision halves its ICI bytes with bit-identical results.  The same
    # holds for per-TABLE-scale int8 storage (no "scale" key): rows are raw
    # int8 codes in [-127, 127], exact in bf16.  f32 storage and per-row
    # int8 (scale product is not bf16-exact) stay f32.
    if isinstance(table_shard, dict):
        bf16_exact = "scale" not in table_shard
    else:
        bf16_exact = table_shard.dtype == jnp.bfloat16
    wire_dtype = jnp.bfloat16 if bf16_exact else rows.dtype
    rows = rows.astype(wire_dtype)

    # return trip: back[o, kk] = row my slot (o, kk) asked owner o for
    d = rows.shape[-1]
    back = jax.lax.all_to_all(
        rows.reshape(m, k, d), MODEL_AXIS, split_axis=0, concat_axis=0
    ).reshape(m * k, d)
    zero_row = jnp.zeros((1, d), back.dtype)
    rows_e = jnp.take(
        jnp.concatenate([back, zero_row]), jnp.minimum(slot, m * k), axis=0
    ).astype(jnp.float32)  # [Em, D]; dropped/invalid entries -> 0
    if hot_e is not None:
        rows_e = rows_e + hot_e.astype(rows_e.dtype)
    return rows_e, dropped


def _routed_pooled_lookup(rows_per_shard, pooling, pack, cf, m, strided,
                          table_shard, g_idx, mask,
                          hot_ids=None, hot_rows=None):
    """Per-device body of lookup_routed.  See the method docstring.

    Shapes (per device): table_shard [rps/pack, width]; g_idx/mask [T, Cd]
    (replicated over model within a data row).  Device mi processes the
    mi-th slice of the T*Cd entries; pooled partials psum over model.
    Returns (pooled [Bd, T, D], dropped [1] int32 — this data-row's global
    overflow-drop count, psum'd over model; zero by construction at the
    default safe capacity factor).
    """
    t, cd = g_idx.shape
    mi = jax.lax.axis_index(MODEL_AXIS)
    e_total = t * cd
    em = -(-e_total // m)  # entries per device (ceil)
    pad = em * m - e_total

    gs, vs = _slice_entries(mi, m, em, pad, g_idx.reshape(-1), mask.reshape(-1))
    rows_e, dropped = _route_rows(
        table_shard, gs, vs, rows_per_shard=rows_per_shard, pack=pack,
        cf=cf, m=m, strided=strided, hot_ids=hot_ids, hot_rows=hot_rows,
    )

    # pooled partial: entry (global index e) belongs to (table e//Cd,
    # bag (e%Cd)//L); bags sum partials across devices via psum
    bd = cd // pooling
    d = rows_e.shape[-1]
    e_ids = mi * em + jnp.arange(em, dtype=jnp.int32)
    tt = jnp.minimum(e_ids // cd, t - 1)
    bag = (e_ids % cd) // pooling
    seg = tt * bd + bag  # [Em] in [0, T*Bd)
    pooled = jax.ops.segment_sum(rows_e, seg, num_segments=t * bd)
    pooled = pooled.reshape(t, bd, d)
    pooled = jnp.transpose(pooled, (1, 0, 2))
    return jax.lax.psum(pooled, MODEL_AXIS), dropped


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_per_shard", "batch", "pack", "cf", "strided",
        "data_sharded",
    ),
)
def _lookup_csr_routed_dispatch(
    mesh, rows_per_shard, batch, pack, cf, strided, data_sharded,
    fused_table, g_idx, offsets
):
    m = mesh.shape[MODEL_AXIS]
    q_spec = P(None, DATA_AXIS) if data_sharded else P()
    bdim = DATA_AXIS if data_sharded else None
    local = functools.partial(
        _routed_csr_pooled_lookup, rows_per_shard, batch, pack, cf, m, strided
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(_tspec(fused_table, P(MODEL_AXIS, None), P(MODEL_AXIS)),
                  q_spec, q_spec),
        out_specs=(P(bdim, None, None), P(bdim)),
        check_vma=check_vma_enabled(),
    )
    return fn(fused_table, g_idx, offsets)


def _routed_csr_pooled_lookup(rows_per_shard, batch, pack, cf, m, strided,
                              table_shard, g_idx, offsets):
    """Per-device body of lookup_csr(routed=True): the ragged analog of
    _routed_pooled_lookup.  Bag membership comes from the offsets
    (vectorized searchsorted — the reference DPU kernel's per-entry bag
    walk, emb_dpu_lookup.c:106-116) instead of a static pooling factor;
    each entry carries its fused (table, bag) segment id through the
    entry-slice so pooled partials psum-merge exactly like the dense form.

    Shapes (per device): g_idx [T, Cd], offsets [T, Bd+1] with offsets
    LOCAL to this device's entry window (data_sharded) or global (nd=1).
    Returns (pooled-SUM [Bd, T, D], dropped [1])."""
    from ..ops.ragged import segment_ids_from_offsets

    t, cd = g_idx.shape
    mi = jax.lax.axis_index(MODEL_AXIS)
    seg = jax.vmap(
        lambda o: segment_ids_from_offsets(o, cd)
    )(offsets).astype(jnp.int32)  # [T, Cd] bag ids; padding -> batch
    valid = seg < batch
    tid = jax.lax.broadcasted_iota(jnp.int32, (t, cd), 0)
    fseg = tid * batch + jnp.minimum(seg, batch - 1)  # [T, Cd] in [0, T*B)

    e_total = t * cd
    em = -(-e_total // m)
    pad = em * m - e_total
    gs, vs, ss = _slice_entries(
        mi, m, em, pad,
        g_idx.reshape(-1), valid.reshape(-1), fseg.reshape(-1),
    )
    rows_e, dropped = _route_rows(
        table_shard, gs, vs, rows_per_shard=rows_per_shard, pack=pack,
        cf=cf, m=m, strided=strided,
    )
    pooled = jax.ops.segment_sum(rows_e, ss, num_segments=t * batch)
    pooled = jnp.transpose(pooled.reshape(t, batch, -1), (1, 0, 2))
    return jax.lax.psum(pooled, MODEL_AXIS), dropped


def _csr_mean_divide(pooled, offsets, nd):
    """MEAN finalization for the routed CSR path: bag sizes from the
    offsets ([T, Nd*(Bd+1)] — per-window diffs), divided outside the
    shard_map on the [Nd*Bd, T, D] pooled sums.  Empty bags stay 0."""
    t = offsets.shape[0]
    win = offsets.reshape(t, nd, -1)  # [T, Nd, Bd+1]
    counts = (win[:, :, 1:] - win[:, :, :-1]).astype(pooled.dtype)
    counts = jnp.transpose(counts, (1, 2, 0)).reshape(-1, t)[..., None]
    return pooled / jnp.maximum(counts, 1)
