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

Storage: {"q": int8 [storage_rows, storage_width], "scale": f32
[total_rows]} — scale is 1-D (a [N, 1] array would relayout
catastrophically; docs/PERF.md rule 2).  Lane packing and ROW_HASH strided
placement work exactly as in EmbeddingCollection.  Inference-only: int8
rows cannot absorb gradient scatters (mirror of the reference, whose DPU
path is inference-only — SURVEY.md §2b).
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
from .collection import _owner_local, _rowish
from .mesh import DATA_AXIS, MODEL_AXIS
from .planner import FusedLayout, plan


@dataclasses.dataclass(frozen=True)
class QuantizedEmbeddingCollection:
    """Int8 fused storage + per-row scales over the mesh (inference-only)."""

    layout: FusedLayout
    mesh: Mesh

    @staticmethod
    def create(
        tables: Sequence[TableConfig],
        mesh: Mesh,
        policy: ShardingPolicy = ShardingPolicy.AUTO,
        *,
        packed: bool | str = "auto",
    ) -> "QuantizedEmbeddingCollection":
        num_shards = mesh.shape[MODEL_AXIS]
        lay = plan(tables, num_shards, policy, packed)
        if lay.policy == ShardingPolicy.COLUMN:
            raise ValueError(
                "int8 collection: COLUMN sharding would split per-row scales"
            )
        return QuantizedEmbeddingCollection(lay, mesh)

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
        [-127, 127]; the per-row scale comes from the table's row count
        (same in-kernel searchsorted as EmbeddingCollection.init)."""
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

        q = jax.jit(make_q, out_shardings=self._q_sharding)(key)
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
        path with the reference's quantize-on-load, SURVEY.md §3.3)."""
        lay = self.layout
        fused = np.zeros((lay.total_rows, lay.dim), np.float32)
        for arr, off, rows in zip(host_tables, lay.row_offsets, lay.table_rows):
            fused[off : off + rows] = arr
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
        return {
            "q": jax.device_put(jnp.asarray(q), self._q_sharding),
            "scale": jax.device_put(jnp.asarray(scale), self._scale_sharding),
        }

    # -- lookup ---------------------------------------------------------

    def globalize(self, indices: jax.Array) -> jax.Array:
        offs = jnp.asarray(self.layout.row_offsets, dtype=indices.dtype)
        return indices + offs[:, None]

    def lookup(
        self,
        params: dict,
        indices: jax.Array,  # [T, B*L] local ids
        mask: jax.Array,
        *,
        batch_size: int | None = None,
    ) -> jax.Array:  # [B, T, D] f32
        t, c = indices.shape
        b = batch_size if batch_size is not None else c
        if c % b:
            raise ValueError(f"capacity {c} not divisible by batch {b}")
        g_idx = self.globalize(indices)
        return _q_lookup_dispatch(
            self.mesh,
            self.layout.policy,
            self.layout.rows_per_shard,
            c // b,
            self.layout.pack,
            self._strided,
            params["q"],
            params["scale"],
            g_idx,
            mask,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "policy", "rows_per_shard", "pooling", "pack", "strided"
    ),
)
def _q_lookup_dispatch(
    mesh, policy, rows_per_shard, pooling, pack, strided, q, scale, g_idx, mask
):
    m = mesh.shape[MODEL_AXIS]
    if policy == ShardingPolicy.REPLICATE:
        fn = shard_map(
            functools.partial(_q_pooled_lookup, pooling, pack, None, False, 1),
            mesh=mesh,
            in_specs=(P(), P(), P(None, DATA_AXIS), P(None, DATA_AXIS)),
            out_specs=P(DATA_AXIS, None, None),
        )
        return fn(q, scale, g_idx, mask)
    fn = shard_map(
        functools.partial(
            _q_pooled_lookup, pooling, pack, rows_per_shard, strided, m
        ),
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None),
            P(MODEL_AXIS),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS, None, None),
    )
    return fn(q, scale, g_idx, mask)


def _q_pooled_lookup(pooling, pack, rows_per_shard, strided, num_shards,
                     q_shard, scale_shard, g_idx, mask):
    """Gather int8 rows + per-row scales, dequant, mask, pool (f32)."""
    t, c = g_idx.shape
    if rows_per_shard is not None:
        shard = jax.lax.axis_index(MODEL_AXIS)
        owner, local = _owner_local(g_idx, rows_per_shard, num_shards, strided)
        owned = (owner == shard) & (local < rows_per_shard) & mask
        local = jnp.where(owned, local, 0)
    else:
        local, owned = g_idx, mask
    d = q_shard.shape[-1] // pack
    if pack == 1:
        rows = jnp.take(q_shard, local, axis=0).astype(jnp.float32)
    else:
        # int8 in [-127, 127] is exact in bf16 (8 mantissa bits); one-hot
        # group select on the VPU with f32 accumulation
        wide = jnp.take(q_shard, local // pack, axis=0).astype(jnp.bfloat16)
        g = jax.nn.one_hot(local % pack, pack, dtype=jnp.bfloat16)
        rows = jnp.einsum(
            "tcpd,tcp->tcd", wide.reshape(t, c, pack, d), g,
            preferred_element_type=jnp.float32,
        )
    s = jnp.take(scale_shard, local)  # [T, C] f32
    rows = rows * (s * owned.astype(s.dtype))[..., None]
    pooled = rows.reshape(t, c // pooling, pooling, -1).sum(axis=2)
    pooled = jnp.transpose(pooled, (1, 0, 2))
    if rows_per_shard is not None:
        pooled = jax.lax.psum(pooled, MODEL_AXIS)
    return pooled
