"""Hybrid embedding collection: MXU one-hot matmuls for small tables,
sharded HBM gather for big tables.

Motivation (measured, docs/PERF.md): random row gathers cost ~26ns each on
the TensorCore regardless of table size — so the 16 Criteo tables with
<= ~8k rows (131k of the 213k gathers per batch) waste most of the lookup
time.  For a small table the pooled lookup is algebraically
``onehot(ids) @ W`` — a dense matmul the MXU eats at petaflop rates, with
exact f32 accumulation.  Above the threshold the one-hot materialization
(B*L x N bf16) costs more than the gather, so big tables stay on the
gather path (optionally bf16-stored).

This mirrors the production placement wisdom the reference hardwires
(every table gets NR_COLS DPUs regardless of its 3-row or 10M-row size —
emb_host.h:157): here small tables replicate + ride the MXU, big tables
shard + ride HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ShardingPolicy, TableConfig
from .collection import EmbeddingCollection
from .mesh import DATA_AXIS
from jax.sharding import Mesh

# Above this row count the one-hot operand costs more than the gather.
DEFAULT_MXU_THRESHOLD = 8192


@dataclasses.dataclass(frozen=True)
class HybridEmbeddingCollection:
    """Two sub-collections + static routing back to original table order.

    Params pytree: {"small": fused_small | None, "big": fused_big | None}.
    """

    tables: tuple[TableConfig, ...]
    mesh: Mesh
    small: EmbeddingCollection | None
    big: EmbeddingCollection | None
    small_ids: tuple[int, ...]  # original table indices in the small set
    big_ids: tuple[int, ...]
    perm: tuple[int, ...]  # position of original table t in concat(small, big)

    @staticmethod
    def create(
        tables: Sequence[TableConfig],
        mesh: Mesh,
        policy: ShardingPolicy = ShardingPolicy.AUTO,
        *,
        mxu_threshold: int = DEFAULT_MXU_THRESHOLD,
        packed: bool | str = "auto",
    ) -> "HybridEmbeddingCollection":
        small_ids = tuple(
            i for i, t in enumerate(tables) if t.num_rows <= mxu_threshold
        )
        big_ids = tuple(
            i for i, t in enumerate(tables) if t.num_rows > mxu_threshold
        )
        small = (
            # the MXU path slices per-table weights out of the fused array,
            # so the small set stays unpacked
            EmbeddingCollection.create(
                [tables[i] for i in small_ids], mesh, ShardingPolicy.REPLICATE
            )
            if small_ids
            else None
        )
        big = (
            # lane-packed storage (dim<128): one 128-lane gather serves
            # pack=128/dim rows — see FusedLayout.pack
            EmbeddingCollection.create(
                [tables[i] for i in big_ids], mesh, policy, packed=packed
            )
            if big_ids
            else None
        )
        order = list(small_ids) + list(big_ids)
        perm = tuple(order.index(t) for t in range(len(tables)))
        return HybridEmbeddingCollection(
            tables=tuple(tables),
            mesh=mesh,
            small=small,
            big=big,
            small_ids=small_ids,
            big_ids=big_ids,
            perm=perm,
        )

    # -- params -------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        ks, kb = jax.random.split(key)
        return {
            "small": self.small.init(ks, dtype) if self.small else None,
            "big": self.big.init(kb, dtype) if self.big else None,
        }

    def device_put_tables(self, host_tables: Sequence[np.ndarray]) -> dict:
        return {
            "small": self.small.device_put_tables(
                [host_tables[i] for i in self.small_ids]
            )
            if self.small
            else None,
            "big": self.big.device_put_tables(
                [host_tables[i] for i in self.big_ids]
            )
            if self.big
            else None,
        }

    # -- lookup -------------------------------------------------------------

    def lookup(
        self,
        params: dict,
        indices: jax.Array,  # [T, B*L]
        mask: jax.Array,  # [T, B*L]
        *,
        batch_size: int,
    ) -> jax.Array:  # [B, T, D]
        parts = []
        if self.small:
            sel = jnp.asarray(self.small_ids, dtype=jnp.int32)
            parts.append(
                _mxu_pooled_lookup(
                    params["small"],
                    self.small.layout,
                    jnp.take(indices, sel, axis=0),
                    jnp.take(mask, sel, axis=0),
                    batch_size=batch_size,
                )
            )
        if self.big:
            sel = jnp.asarray(self.big_ids, dtype=jnp.int32)
            parts.append(
                self.big.lookup(
                    params["big"],
                    jnp.take(indices, sel, axis=0),
                    jnp.take(mask, sel, axis=0),
                    batch_size=batch_size,
                )
            )
        pooled = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        # static permutation back to the caller's table order
        return jnp.take(pooled, jnp.asarray(self.perm, dtype=jnp.int32), axis=1)


def init_accumulator_hybrid(coll: HybridEmbeddingCollection) -> dict:
    from .sparse_update import init_accumulator

    return {
        "small": init_accumulator(coll.small) if coll.small else None,
        "big": init_accumulator(coll.big) if coll.big else None,
    }


def sparse_update_hybrid(
    coll: HybridEmbeddingCollection,
    params: dict,
    accs: dict,
    indices: jax.Array,  # [T, B*L]
    mask: jax.Array,
    g_pooled: jax.Array,  # [B, T, D] in original table order
    *,
    lr: float,
    optimizer: str = "sgd",
    eps: float = 1e-8,
) -> tuple[dict, dict]:
    """Apply the embedding optimizer step to both sub-collections.

    The big set keeps the scatter path; the small set takes an MXU path
    (onehot^T matmul densifies the tiny-table grads) — the backward mirror
    of the forward hybrid split.  Small tables receive most of the
    per-entry updates (131k of 213k at Criteo-Kaggle batch 8192) while
    holding <0.1% of the rows, so entry-wise random scatters there waste
    the same issue-rate budget the forward gathers did."""
    from .sparse_update import sparse_update

    params, accs = dict(params), dict(accs)
    if coll.small is not None:
        sel = jnp.asarray(coll.small_ids, dtype=jnp.int32)
        params["small"], accs["small"] = _mxu_sparse_update(
            coll.small,
            params["small"],
            accs["small"],
            jnp.take(indices, sel, axis=0),
            jnp.take(mask, sel, axis=0),
            jnp.take(g_pooled, sel, axis=1),
            lr=lr,
            optimizer=optimizer,
            eps=eps,
        )
    if coll.big is not None:
        sel = jnp.asarray(coll.big_ids, dtype=jnp.int32)
        params["big"], accs["big"] = sparse_update(
            coll.big,
            params["big"],
            accs["big"],
            jnp.take(indices, sel, axis=0),
            jnp.take(mask, sel, axis=0),
            jnp.take(g_pooled, sel, axis=1),
            lr=lr,
            optimizer=optimizer,
            eps=eps,
        )
    return params, accs


def _mxu_sparse_update(
    small: EmbeddingCollection,
    fused: jax.Array,  # [total_rows, D] replicated
    acc: jax.Array,  # [total_rows] row-adagrad accumulator
    indices: jax.Array,  # [Ts, B*L] local ids
    mask: jax.Array,  # [Ts, B*L]
    g_pooled: jax.Array,  # [B, Ts, D]
    *,
    lr: float,
    optimizer: str,
    eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Densify small-table grads on the MXU, then update rows in place.

    Exactly equivalent to the entry-wise scatter (sparse_update._apply_local):
    there, acc is fully scatter-updated BEFORE any entry reads it, and every
    entry of row r steps by -lr*rsqrt(acc[r]+eps)*g_entry — summing entries
    gives -lr*rsqrt(acc[r]+eps) * grad[r] with grad = onehot^T @ g_entries,
    which is what this computes (f32 accumulation on the MXU).
    """
    t, c = indices.shape
    b = g_pooled.shape[0]
    l = c // b
    d = g_pooled.shape[-1]
    layout = small.layout
    # bag-expand the pooled cotangent: every entry of a bag gets it (sum-pool
    # backward), masked entries contribute nothing
    g_e = jnp.transpose(g_pooled, (1, 0, 2))[:, :, None, :]  # [Ts, B, 1, D]
    g_e = jnp.broadcast_to(g_e, (t, b, l, d)).reshape(t, c, d)
    g_e = g_e * mask[..., None].astype(g_e.dtype)

    new_fused, new_acc = fused, acc
    for k in range(t):
        n = layout.table_rows[k]
        off = layout.row_offsets[k]
        ids = jnp.where(mask[k], indices[k], n)  # masked -> padding row
        oh = jax.nn.one_hot(ids, n, dtype=jnp.bfloat16)  # [C, n] (row n drops)
        grad = jnp.einsum(
            "cn,cd->nd", oh, g_e[k].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [n, D] dense table grad
        w = jax.lax.dynamic_slice_in_dim(new_fused, off, n, axis=0)
        if optimizer == "row_adagrad":
            sq = jnp.mean(g_e[k] * g_e[k], axis=-1)  # [C] per-entry mean_d g^2
            a = jax.lax.dynamic_slice_in_dim(new_acc, off, n, axis=0)
            a = a + jnp.einsum(
                "cn,c->n", oh, sq.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            new_acc = jax.lax.dynamic_update_slice_in_dim(new_acc, a, off, axis=0)
            step = (lr * jax.lax.rsqrt(a + eps))[:, None] * grad
        else:
            step = lr * grad
        w = (w.astype(jnp.float32) - step).astype(new_fused.dtype)
        new_fused = jax.lax.dynamic_update_slice_in_dim(new_fused, w, off, axis=0)
    return new_fused, new_acc


def _mxu_pooled_lookup(fused, layout, indices, mask, *, batch_size):
    """One one-hot x slice matmul per small table, f32 accumulation.

    fused: the small set's fused [total_rows, D] table; per-table weights
    are static slices of it, so autodiff lands grads in the shared array.
    """
    t, c = indices.shape
    l = c // batch_size
    outs = []
    for k in range(t):
        n = layout.table_rows[k]
        off = layout.row_offsets[k]
        w = jax.lax.dynamic_slice_in_dim(fused, off, n, axis=0)  # static off
        ids = indices[k]
        oh = jax.nn.one_hot(ids, n, dtype=jnp.bfloat16)
        oh = oh * mask[k][:, None].astype(oh.dtype)
        pooled = jnp.dot(
            oh, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )  # [B*L, D]
        pooled = pooled.reshape(batch_size, l, -1).sum(axis=1)
        outs.append(pooled)
    return jnp.stack(outs, axis=1)  # [B, Ts, D]
