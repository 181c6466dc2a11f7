"""Hot-row replication cache for skewed (zipf) id streams.

Real recommendation traffic is power-law: a handful of rows absorb a large
share of lookups.  Under row sharding every hot row lives on exactly one
shard, so the routed lookup's all-to-all funnels the hot traffic to a few
devices — the load-imbalance hazard SURVEY.md §7 hard part (c) calls out,
with the standard fix it names (RecShard-style: replicate the top-k hot
rows).  This module provides that cache:

* ``hot_ids_from_sample`` — pick the top-k fused ids from a sample of the
  query stream (host-side, numpy).
* ``build_hot_cache`` — gather those rows out of the sharded fused table
  into a small replicated ``[K, D]`` array (one psum-merged shard_map).
* ``EmbeddingCollection.lookup_routed(..., hot_cache=...)`` — entries whose
  id is in the cache are served locally from the replica (a searchsorted
  over K + one tiny gather) and excluded from routing; cold entries route
  as usual.

The cache is a SNAPSHOT: after training steps the replica goes stale —
rebuild it (serving/inference is the intended consumer, mirroring the
reference's inference-only offload).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import ShardingPolicy
from .collection import EmbeddingCollection, _gather_f32, _owner_local, _tspec
from .mesh import MODEL_AXIS


def hot_ids_from_sample(
    coll: EmbeddingCollection,
    indices_sample: np.ndarray,  # [T, C] local per-table ids (query stream)
    k: int,
) -> np.ndarray:
    """Top-k hottest FUSED ids in a stream sample (sorted ascending)."""
    offs = np.asarray(coll.layout.row_offsets, dtype=np.int64)
    fused = (indices_sample.astype(np.int64) + offs[:, None]).reshape(-1)
    ids, counts = np.unique(fused, return_counts=True)
    top = ids[np.argsort(-counts)[:k]]
    return np.sort(top).astype(np.int32)


def build_hot_cache(
    coll, fused, hot_ids: np.ndarray
) -> tuple[jax.Array, jax.Array]:
    """(hot_ids [K] sorted, hot_rows [K, D] f32) — both replicated.

    ``coll`` may be an EmbeddingCollection or a QuantizedEmbeddingCollection
    (``fused`` then is its params dict).  Per-row scale mode ({"q",
    "scale"}): _gather_f32 dequantizes in the gather, so the cache holds
    true f32 rows.  Per-table mode ({"q", "tscale"}): the cache holds rows
    in QUANTIZED units — the same units the routed gather returns — so
    cache hits merge exactly and the per-table scale folds into the pooled
    output downstream (QuantizedEmbeddingCollection._apply_tscale).  Either
    way cache hits bypass the int8 gather entirely."""
    if isinstance(fused, dict) and "tscale" in fused:
        fused = {"q": fused["q"]}
    lay = coll.layout
    ids = jnp.asarray(np.sort(np.asarray(hot_ids)).astype(np.int32))
    strided = lay.policy == ShardingPolicy.ROW_HASH
    rowish = lay.policy in (
        ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE
    )
    if not rowish:
        # replicated storage: direct gather
        rows = jax.jit(
            functools.partial(_gather_f32, pack=lay.pack)
        )(fused, ids)
        return ids, rows

    def gather_shard(table_shard, ids_):
        shard = jax.lax.axis_index(MODEL_AXIS)
        owner, local = _owner_local(
            ids_, lay.rows_per_shard, lay.num_shards, strided
        )
        owned = owner == shard
        local = jnp.where(owned, local, 0)
        rows = _gather_f32(table_shard, local, lay.pack)
        rows = rows * owned[:, None].astype(rows.dtype)
        return jax.lax.psum(rows, MODEL_AXIS)

    fn = shard_map(
        gather_shard,
        mesh=coll.mesh,
        in_specs=(_tspec(fused, P(MODEL_AXIS, None), P(MODEL_AXIS)), P()),
        out_specs=P(),
    )
    rows = jax.jit(fn)(fused, ids)
    return ids, rows


def hot_cache_select(hot_ids, hot_rows, gs, vs):
    """Per-entry cache probe: (is_hit [E], rows [E, D]).

    hot_ids sorted ascending; binary search + equality check; misses and
    invalid entries return zero rows.
    """
    k = hot_ids.shape[0]
    # The default "scan" binary search lowers to a sequential log2(K)-step
    # loop of per-entry gathers on TPU (the same trap that cost the CSR
    # surface 4.4x — docs/PERF.md "searchsorted trap").  Measured at
    # E=27k/K=1024 on chip: compare_all 654us, sort 998us, scan 2037us.
    # compare_all's E x K compare matrix scales linearly with K, so switch
    # to the O((E+K) log) concat-sort above 2048 cached rows.
    method = "compare_all" if k <= 2048 else "sort"
    pos = jnp.searchsorted(hot_ids, gs, method=method)
    pos_c = jnp.minimum(pos, k - 1)
    hit = (jnp.take(hot_ids, pos_c) == gs) & (pos < k) & vs
    rows = jnp.take(hot_rows, pos_c, axis=0)
    return hit, rows * hit[:, None].astype(hot_rows.dtype)
