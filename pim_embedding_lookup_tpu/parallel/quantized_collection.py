"""Sharded int8 embedding collection: 4x the rows per chip, f32 accuracy
where it matters (accumulation).

The reference keeps tables in int32 fixed point because DPUs have no FPU
(emb_host.h:207-212 decodes with /1e9) and caps each DPU at a 14MB MRAM
slice (emb_types.h:5) — capacity is the binding constraint.  The TPU
analog: int8 rows with a per-fused-row f32 scale quarter the HBM bytes, so
the BASELINE.json 100M-row-table configs fit on a single chip (100M x 64
= 25.6GB f32 -> 6.4GB int8).  Gathers are issue-rate bound, so the extra
per-entry scale gather makes this mode ~2x slower than bf16 — int8 is the
CAPACITY mode, not the speed mode (docs/PERF.md).

Storage comes in two scale granularities (``scale_mode``):

* ``"table"`` (default — the fast form): {"q": int8 [storage_rows,
  storage_width], "tscale": f32 [T]}.  One symmetric scale per TABLE,
  folded into the pooled [B, T, D] output AFTER pooling — zero per-entry
  cost, so the gather pays exactly one issue per entry like f32/bf16
  storage.  This matches the reference, which decodes per POOLED value
  after its DPU hot loop (emb_host.h:207-212, one /1e9 per output), and
  is strictly finer than the reference's single global scale.
* ``"row"`` (the accuracy form): {"q": ..., "scale": f32 [total_rows]}.
  Per-row symmetric scales adapt to per-row magnitude spread in trained
  tables, but the scale rides the gather as a SECOND issue per entry —
  measured ~2x the lookup cost (docs/PERF.md).

Scales are 1-D (a [N, 1] array would relayout catastrophically;
docs/PERF.md rule 2).  Lane packing and ROW_HASH strided placement work
exactly as in EmbeddingCollection.  Inference-only: int8 rows cannot
absorb gradient scatters (mirror of the reference, whose DPU path is
inference-only — SURVEY.md §2b).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ShardingPolicy, TableConfig
from .collection import EmbeddingCollection
from .mesh import MODEL_AXIS
from .planner import FusedLayout, plan


@dataclasses.dataclass(frozen=True)
class QuantizedEmbeddingCollection:
    """Int8 fused storage + per-row scales over the mesh (inference-only)."""

    layout: FusedLayout
    mesh: Mesh
    scale_mode: str = "table"  # "table" (fast) | "row" (per-row accuracy)

    def __post_init__(self):
        # validate here, not only in create(): direct construction (e.g.
        # models/quantize.py reusing an existing layout) must not let a
        # typo'd scale_mode silently select the 2x-slower per-row checks
        if self.scale_mode not in ("table", "row"):
            raise ValueError(
                f"scale_mode must be 'table' or 'row': {self.scale_mode!r}"
            )

    @staticmethod
    def create(
        tables: Sequence[TableConfig],
        mesh: Mesh,
        policy: ShardingPolicy = ShardingPolicy.AUTO,
        *,
        packed: bool | str = "auto",
        scale_mode: str = "table",
    ) -> "QuantizedEmbeddingCollection":
        if scale_mode not in ("table", "row"):
            raise ValueError(f"scale_mode must be 'table' or 'row': {scale_mode}")
        num_shards = mesh.shape[MODEL_AXIS]
        lay = plan(tables, num_shards, policy, packed)
        if lay.policy == ShardingPolicy.COLUMN:
            raise ValueError(
                "int8 collection: COLUMN sharding would split per-row scales"
            )
        return QuantizedEmbeddingCollection(lay, mesh, scale_mode)

    # -- shardings ------------------------------------------------------

    @property
    def _q_sharding(self) -> NamedSharding:
        if self.layout.policy == ShardingPolicy.REPLICATE:
            return NamedSharding(self.mesh, P())
        return NamedSharding(self.mesh, P(MODEL_AXIS, None))

    @property
    def _scale_sharding(self) -> NamedSharding:
        if self.layout.policy == ShardingPolicy.REPLICATE:
            return NamedSharding(self.mesh, P())
        return NamedSharding(self.mesh, P(MODEL_AXIS))

    @property
    def _strided(self) -> bool:
        return self.layout.policy == ShardingPolicy.ROW_HASH

    # -- storage --------------------------------------------------------

    def init(self, key: jax.Array) -> dict:
        """Random init straight in int8: u ~ U(-bound, bound) quantized with
        the analytically-known scale bound/127 is just uniform int8 in
        [-127, 127].  All rows of a table share the analytic scale
        (1/sqrt(rows))/127, so "row" and "table" modes are numerically
        IDENTICAL at init — they differ only on trained tables
        (quantize_tables), where per-row absmax spread appears."""
        ends, inv = self._sorted_table_ends()
        lay = self.layout
        pack, dim, m = lay.pack, lay.dim, lay.num_shards
        srows_per_shard = lay.rows_per_shard // pack
        strided = self._strided

        def fused_row_of(q, lane):
            s = q // srows_per_shard
            j = (q % srows_per_shard) * pack + lane // dim
            return j * m + s if strided else s * lay.rows_per_shard + j

        def make_q(k):
            return jax.random.randint(
                k, (lay.storage_rows, lay.storage_width), -127, 128, jnp.int8
            )

        q = jax.jit(make_q, out_shardings=self._q_sharding)(key)
        if self.scale_mode == "table":
            tscale = jnp.asarray(
                [1.0 / (np.sqrt(r) * 127.0) for r in lay.table_rows],
                dtype=jnp.float32,
            )
            return {"q": q, "tscale": tscale}

        def make_scale():
            # scale[fused row g] = (1/sqrt(rows(g)))/127, in storage order
            p = jnp.arange(lay.total_rows, dtype=jnp.int32)
            s = p // lay.rows_per_shard
            j = p % lay.rows_per_shard
            frow = j * m + s if strided else p
            tid = jnp.searchsorted(jnp.asarray(ends), frow, side="right")
            return jnp.take(
                jnp.asarray(inv, dtype=jnp.float32),
                jnp.minimum(tid, len(lay.table_rows) - 1),
            ) / 127.0

        scale = jax.jit(make_scale, out_shardings=self._scale_sharding)()
        return {"q": q, "scale": scale}

    def _sorted_table_ends(self):
        pairs = sorted(
            (off + rows, 1.0 / np.sqrt(rows))
            for off, rows in zip(self.layout.row_offsets, self.layout.table_rows)
        )
        return (
            np.asarray([p[0] for p in pairs], dtype=np.int32),
            np.asarray([p[1] for p in pairs], dtype=np.float32),
        )

    def quantize_tables(self, host_tables: Sequence[np.ndarray]) -> dict:
        """Host f32 tables -> device int8+scale params (populate_mram parity
        path with the reference's quantize-on-load, SURVEY.md §3.3).

        "table" mode: one symmetric scale per table (absmax over the whole
        table / 127) — the pooled-output fold carries it, so lookups pay no
        per-entry scale gather.  "row" mode: per-row absmax scales."""
        lay = self.layout
        fused = np.zeros((lay.total_rows, lay.dim), np.float32)
        for arr, off, rows in zip(host_tables, lay.row_offsets, lay.table_rows):
            fused[off : off + rows] = arr
        if self.scale_mode == "table":
            tscale = np.empty(len(lay.table_rows), np.float32)
            scale = np.ones(lay.total_rows, np.float32)
            for t, (off, rows) in enumerate(
                zip(lay.row_offsets, lay.table_rows)
            ):
                am = np.abs(fused[off : off + rows]).max() if rows else 0.0
                tscale[t] = am / 127.0 if am > 0 else 1.0
                scale[off : off + rows] = tscale[t]
        else:
            absmax = np.abs(fused).max(axis=1)
            scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(fused / scale[:, None]), -127, 127).astype(np.int8)
        if self._strided:
            m, rps = lay.num_shards, lay.rows_per_shard
            perm = (
                np.arange(rps)[None, :] * m + np.arange(m)[:, None]
            ).reshape(-1)
            q, scale = q[perm], scale[perm]
        q = q.reshape(lay.storage_rows, lay.storage_width)
        if self.scale_mode == "table":
            return {
                "q": jax.device_put(jnp.asarray(q), self._q_sharding),
                "tscale": jnp.asarray(tscale),
            }
        return {
            "q": jax.device_put(jnp.asarray(q), self._q_sharding),
            "scale": jax.device_put(jnp.asarray(scale), self._scale_sharding),
        }

    # -- lookup ---------------------------------------------------------

    def globalize(self, indices: jax.Array) -> jax.Array:
        offs = jnp.asarray(self.layout.row_offsets, dtype=indices.dtype)
        return indices + offs[:, None]

    @property
    def _delegate(self) -> EmbeddingCollection:
        """The full f32 query surface runs on int8 dict storage: every
        EmbeddingCollection lookup dispatch gathers through _gather_f32,
        which dequantizes {"q", "scale"} params in-kernel (collection.py).
        Sharing the dispatches (not copies of them) is what makes int8 a
        full citizen of the query matrix — CSR, MEAN/MAX, routed, hot-cache
        — rather than a parallel one-method implementation."""
        return EmbeddingCollection(layout=self.layout, mesh=self.mesh)

    def _storage(self, params: dict) -> dict:
        """The dict the shared dispatches see.  "table" mode strips the [T]
        tscale (it is NOT per-fused-row and must not enter shard_map specs);
        _gather_f32 then returns rows in quantized units."""
        if "tscale" in params:
            return {"q": params["q"]}
        return params

    def _apply_tscale(self, params: dict, out):
        """Fold the per-table scale into the pooled [B, T, D] output.

        Sound for every combiner: SUM/MEAN are linear and MAX commutes with
        multiplication by a positive scalar.  ``out`` may be (pooled,
        stats) from a return_stats dispatch."""
        if "tscale" not in params:
            return out
        ts = params["tscale"][None, :, None]
        if isinstance(out, tuple):
            pooled, stats = out
            return pooled * ts, stats
        return out * ts

    def lookup(
        self,
        params: dict,
        indices: jax.Array,  # [T, B*L] local ids
        mask: jax.Array,
        *,
        batch_size: int | None = None,
        combiner: str = "sum",  # "sum" | "mean" | "max"
    ) -> jax.Array:  # [B, T, D] f32
        return self._apply_tscale(params, self._delegate.lookup(
            self._storage(params), indices, mask,
            batch_size=batch_size, combiner=combiner,
        ))

    def lookup_csr(
        self,
        params: dict,
        indices: jax.Array,  # [T, C] flat ids ([T, Nd*Cd] data_sharded)
        offsets: jax.Array,  # [T, B+1] ([T, Nd*(Bd+1)] data_sharded)
        *,
        combiner: str = "sum",
        data_sharded: bool = False,
        routed: bool = False,
        capacity_factor: float | None = None,
        return_stats: bool = False,
    ) -> jax.Array | tuple[jax.Array, jax.Array]:
        """Ragged (CSR) pooled lookup on int8 storage — the reference's
        native wire shape (emb_host.h:234) at capacity-mode density.
        Same contract as EmbeddingCollection.lookup_csr (incl. routed)."""
        return self._apply_tscale(params, self._delegate.lookup_csr(
            self._storage(params), indices, offsets, combiner=combiner,
            data_sharded=data_sharded, routed=routed,
            capacity_factor=capacity_factor, return_stats=return_stats,
        ))

    def lookup_routed(
        self,
        params: dict,
        indices: jax.Array,
        mask: jax.Array,
        *,
        batch_size: int | None = None,
        capacity_factor: float | None = None,
        hot_cache: tuple[jax.Array, jax.Array] | None = None,
        return_stats: bool = False,
        combiner: str = "sum",
    ) -> jax.Array | tuple[jax.Array, jax.Array]:
        """All-to-all routed lookup on int8 storage.  "row" mode: rows
        dequantize ON THE OWNER shard (scale rides the gather) and the
        return all_to_all carries f32.  "table" mode: raw int8 codes ride
        the return all_to_all in bf16 (exact — codes are integers in
        [-127, 127]) and the per-table scale folds into the pooled output
        — half the ICI bytes AND no per-entry scale gather.  ``hot_cache``
        must be built with build_hot_cache against THESE params so its
        rows are in the same units as the gathered rows (quantized units
        in "table" mode)."""
        return self._apply_tscale(params, self._delegate.lookup_routed(
            self._storage(params), indices, mask, batch_size=batch_size,
            capacity_factor=capacity_factor, hot_cache=hot_cache,
            return_stats=return_stats, combiner=combiner,
        ))

    @property
    def safe_capacity_factor(self) -> float:
        return self._delegate.safe_capacity_factor
