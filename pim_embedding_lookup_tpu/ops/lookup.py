"""Embedding-bag gather + pool: XLA baseline and MXU one-hot paths.

Capability parity with the reference's DPU kernel
(upmem/src/dpu/emb_dpu_lookup.c:106-116: per-batch walk over the bag,
summing rows), re-designed for TPU:

* ``embedding_bag_csr``   — XLA take + segment_sum.  The gather lowers to a
  native HBM dynamic-gather; the pool fuses.  Differentiable (the VJP is the
  scatter-add the reference never implemented — it is inference-only).
* ``embedding_bag_onehot`` — one-hot x table matmul on the MXU.  For small
  tables this turns a memory-latency-bound gather into a dense matmul at
  MXU speed; the planner picks it for tables below a row threshold.
* ``embedding_bag_dense`` — fixed pooling-factor [B, L] form.

All shapes are static per jit trace (the XLA analog of the reference baking
MAX_NR_BATCHES/MAX_INDICES_PER_BATCH into the binary, upmem/Makefile:69-81).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Combiner
from .ragged import segment_ids_from_offsets

_NEG_INF = -3.4e38  # max-combiner identity for f32/bf16


def _combine_segments(
    rows: jax.Array,  # [C, D] gathered rows
    seg_ids: jax.Array,  # [C] in [0, B] (B == padding bin)
    batch_size: int,
    combiner: Combiner,
) -> jax.Array:
    if combiner == Combiner.MAX:
        pooled = jax.ops.segment_max(
            rows, seg_ids, num_segments=batch_size + 1, indices_are_sorted=True
        )[:batch_size]
        # empty bags come back as -inf; report 0 like torch EmbeddingBag's
        # zero-init behaviour
        return jnp.where(pooled <= _NEG_INF, 0.0, pooled)
    pooled = jax.ops.segment_sum(
        rows, seg_ids, num_segments=batch_size + 1, indices_are_sorted=True
    )[:batch_size]
    return pooled


@functools.partial(jax.jit, static_argnames=("batch_size", "combiner"))
def embedding_bag_csr(
    table: jax.Array,  # [N, D]
    indices: jax.Array,  # [C] int32, entries >= offsets[-1] are padding
    offsets: jax.Array,  # [B+1] int32, offsets[0] == 0
    *,
    batch_size: int,
    combiner: Combiner = Combiner.SUM,
) -> jax.Array:  # [B, D]
    """Pooled lookup over CSR bags — the TPU analog of lookup()+DPU kernel
    (emb_host.h:234 + emb_dpu_lookup.c:36-138) collapsed into one jitted op."""
    capacity = indices.shape[0]
    seg_ids = segment_ids_from_offsets(offsets, capacity)
    rows = jnp.take(table, indices, axis=0)  # [C, D] HBM gather
    if combiner == Combiner.MAX:
        # route padded entries to the dropped bin with -inf rows
        rows = jnp.where((seg_ids < batch_size)[:, None], rows, _NEG_INF)
    else:
        rows = jnp.where((seg_ids < batch_size)[:, None], rows, 0.0)
    pooled = _combine_segments(rows, seg_ids, batch_size, combiner)
    if combiner == Combiner.MEAN:
        lengths = (offsets[1:] - offsets[:-1]).astype(pooled.dtype)
        pooled = pooled / jnp.maximum(lengths, 1)[:, None]
    return pooled


@functools.partial(jax.jit, static_argnames=("combiner",))
def embedding_bag_dense(
    table: jax.Array,  # [N, D]
    indices: jax.Array,  # [B, L] int32
    mask: jax.Array | None = None,  # [B, L] bool; None = all valid
    *,
    combiner: Combiner = Combiner.SUM,
) -> jax.Array:  # [B, D]
    """Fixed pooling-factor variant (reference's common case: every bag padded
    to MAX_INDICES_PER_BATCH, emb_host.h:258-263)."""
    rows = jnp.take(table, indices, axis=0)  # [B, L, D]
    if mask is None:
        if combiner == Combiner.MAX:
            return jnp.max(rows, axis=1)
        pooled = jnp.sum(rows, axis=1)
        if combiner == Combiner.MEAN:
            pooled = pooled / indices.shape[1]
        return pooled
    m = mask[..., None]
    if combiner == Combiner.MAX:
        pooled = jnp.max(jnp.where(m, rows, _NEG_INF), axis=1)
        return jnp.where(pooled <= _NEG_INF, 0.0, pooled)
    pooled = jnp.sum(jnp.where(m, rows, 0.0), axis=1)
    if combiner == Combiner.MEAN:
        counts = jnp.maximum(jnp.sum(mask, axis=1), 1).astype(pooled.dtype)
        pooled = pooled / counts[:, None]
    return pooled


@functools.partial(jax.jit, static_argnames=("batch_size",))
def embedding_bag_onehot(
    table: jax.Array,  # [N, D], N small
    indices: jax.Array,  # [C]
    offsets: jax.Array,  # [B+1]
    *,
    batch_size: int,
) -> jax.Array:  # [B, D]
    """SUM pooling as ``A @ table`` on the MXU, where A[b, n] counts how many
    times row n appears in bag b.

    TPU-first replacement for latency-bound row gathers on *small* tables:
    A is built with a compare-against-iota (VPU) and the pool+gather becomes
    one dense [B, N] x [N, D] matmul.  Cost is O(C*N + B*N*D) so the planner
    only selects this for N up to a few thousand rows.
    """
    n = table.shape[0]
    capacity = indices.shape[0]
    seg_ids = segment_ids_from_offsets(offsets, capacity)
    valid = seg_ids < batch_size
    # one-hot per entry over rows: [C, N]
    onehot = (indices[:, None] == jnp.arange(n, dtype=indices.dtype)[None, :])
    onehot = jnp.where(valid[:, None], onehot, False).astype(table.dtype)
    # counts per bag: segment-sum entries into bags -> A [B, N]
    a = jax.ops.segment_sum(
        onehot, seg_ids, num_segments=batch_size + 1, indices_are_sorted=True
    )[:batch_size]
    return jnp.dot(a, table, preferred_element_type=jnp.float32).astype(table.dtype)
