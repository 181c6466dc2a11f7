"""Ragged (CSR) bag representation under XLA static shapes.

The reference's wire format is CSR: a flat ``indices`` array plus per-batch
``offsets`` (emb_host.h:234 ``lookup(uint32_t **indices, uint32_t **offsets,
...)``), padded to a fixed capacity ``MAX_INDICES_PER_BATCH * MAX_NR_BATCHES``
(emb_host.h:30) so the host->DPU transfer size is static.  XLA has the same
static-shape constraint, so we keep exactly that contract: a fixed-capacity
flat index buffer + an offsets vector; entries at positions >= offsets[-1]
are padding and contribute nothing.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def segment_ids_from_offsets(offsets: jax.Array, capacity: int) -> jax.Array:
    """Map flat entry position -> owning bag id.

    ``offsets`` has shape [B+1] with offsets[0] == 0; entries in
    [offsets[b], offsets[b+1]) belong to bag b.  Positions >= offsets[B]
    (padding) map to segment id B, which callers drop.

    This replaces the reference's per-tasklet pointer walk over offsets
    (emb_dpu_lookup.c:106-116) with scatter-ones-at-boundaries + cumsum:
    seg[p] = #{b in 1..B : offsets[b] <= p}.  (An earlier searchsorted
    formulation lowered to a per-entry while loop on TPU and cost as much
    as the whole segment reduce; the B-entry scatter + c-long prefix sum
    is fully vectorized.)  Empty bags make consecutive equal boundaries —
    the scatter-ADD accumulates their multiplicity, so the ids still jump
    correctly past them.  Boundaries == capacity (full buffer) fall out of
    range and drop.
    """
    marks = jnp.zeros((capacity,), jnp.int32).at[offsets[1:]].add(
        1, mode="drop"
    )
    return jnp.cumsum(marks)


def pack_bags(
    bags: Sequence[Sequence[int]], capacity: int, pad_index: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side helper: python list-of-bags -> (indices[capacity], offsets[B+1]).

    The analog of the reference host code flattening per-batch bags before
    dpu_push_xfer (c_test.py:46-63 builds exactly this layout).
    """
    flat = [i for bag in bags for i in bag]
    if len(flat) > capacity:
        raise ValueError(f"{len(flat)} indices exceed capacity {capacity}")
    indices = np.full((capacity,), pad_index, dtype=np.int32)
    indices[: len(flat)] = np.asarray(flat, dtype=np.int32)
    offsets = np.zeros((len(bags) + 1,), dtype=np.int32)
    np.cumsum([len(b) for b in bags], out=offsets[1:])
    return indices, offsets


def dense_to_csr(indices_2d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, L] fixed-pooling dense indices -> CSR (flat indices, offsets)."""
    b, l = indices_2d.shape
    offsets = jnp.arange(b + 1, dtype=jnp.int32) * l
    return indices_2d.reshape(-1), offsets


def csr_to_dense(
    indices: jax.Array, offsets: jax.Array, max_len: int, pad_index: int = 0
) -> tuple[jax.Array, jax.Array]:
    """CSR -> ([B, max_len] indices, [B, max_len] validity mask).

    Bags longer than max_len are truncated; used by the one-hot/matmul path.
    """
    b = offsets.shape[0] - 1
    lane = jnp.arange(max_len, dtype=offsets.dtype)
    starts = offsets[:-1, None]
    ends = offsets[1:, None]
    pos = starts + lane[None, :]
    mask = pos < ends
    gathered = jnp.where(mask, indices[jnp.minimum(pos, indices.shape[0] - 1)], pad_index)
    return gathered, mask


def bag_lengths(offsets: jax.Array) -> jax.Array:
    return offsets[1:] - offsets[:-1]


def shard_csr(
    bags_per_table: Sequence[Sequence[Sequence[int]]],
    num_shards: int,
    capacity_per_shard: int,
    pad_index: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side builder for the DATA-SHARDED CSR wire form
    (EmbeddingCollection.lookup_csr(data_sharded=True)).

    ``bags_per_table``: [T][B] list-of-bags; B must divide num_shards.
    Returns (indices [T, Nd*Cd], offsets [T, Nd*(Bd+1)]): data shard d owns
    bags [d*Bd, (d+1)*Bd), its entries packed into its own Cd-entry window,
    its offsets RELATIVE to that window — so both arrays split over the
    data axis with no cross-shard coupling (the fixed per-shard capacity
    analog of the reference's MAX_INDICES_PER_BATCH padding, emb_host.h:30).
    """
    t = len(bags_per_table)
    b = len(bags_per_table[0])
    if b % num_shards:
        raise ValueError(f"batch {b} not divisible by {num_shards} shards")
    bd = b // num_shards
    indices = np.full((t, num_shards * capacity_per_shard), pad_index, np.int32)
    offsets = np.zeros((t, num_shards * (bd + 1)), np.int32)
    for ti, bags in enumerate(bags_per_table):
        for d in range(num_shards):
            local = bags[d * bd : (d + 1) * bd]
            idx, off = pack_bags(local, capacity_per_shard, pad_index)
            indices[ti, d * capacity_per_shard : (d + 1) * capacity_per_shard] = idx
            offsets[ti, d * (bd + 1) : (d + 1) * (bd + 1)] = off
    return indices, offsets
