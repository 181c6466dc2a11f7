"""Row-wise int8 quantized embedding storage.

The reference stores tables in int32 fixed point because DPUs lack FPUs
(emb_host.h:207-212).  On TPU the integer format earns its keep differently:
int8 rows quarter the HBM bytes of the latency/bandwidth-bound gather.
Storage is int8 with a per-row f32 scale (1-D [N] — never [N, 1], see
docs/PERF.md layout rules); accumulation happens in f32 after dequant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ragged import segment_ids_from_offsets


def quantize_rowwise(table: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[N, D] f32 -> (int8 [N, D], scale f32 [N]) with symmetric per-row
    scaling (scale = absmax/127; zero rows get scale 1 to avoid 0/0)."""
    absmax = jnp.max(jnp.abs(table), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(table / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q_rows: jax.Array, scales: jax.Array) -> jax.Array:
    """int8 rows [C, D] + per-row scales [C] -> f32 rows."""
    return q_rows.astype(jnp.float32) * scales[:, None]


@functools.partial(jax.jit, static_argnames=("batch_size",))
def embedding_bag_quantized(
    q_table: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32
    indices: jax.Array,  # [C]
    offsets: jax.Array,  # [B+1]
    *,
    batch_size: int,
) -> jax.Array:  # [B, D] f32
    """SUM-pooled lookup over int8 storage: gather int8 rows + per-row
    scales, dequantize, segment-sum in f32."""
    capacity = indices.shape[0]
    seg_ids = segment_ids_from_offsets(offsets, capacity)
    rows = jnp.take(q_table, indices, axis=0)
    s = jnp.take(scales, indices)
    frows = dequantize_rows(rows, s)
    frows = jnp.where((seg_ids < batch_size)[:, None], frows, 0.0)
    return jax.ops.segment_sum(
        frows, seg_ids, num_segments=batch_size + 1, indices_are_sorted=True
    )[:batch_size]
