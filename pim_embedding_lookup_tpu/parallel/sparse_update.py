"""Sparse in-place embedding updates: scatter-add directly into the sharded
fused table, never materializing a dense gradient buffer.

SURVEY.md §7 hard part (a): the naive backward produces a dense
[total_rows, D] cotangent (2.2GB for Criteo-Kaggle, 100s of GB for the
big-table configs) even though only batch*T*L rows were touched.  Here the
optimizer step for the embedding half is fused into a shard_map scatter:

  * entries (id, pooled-cotangent) are all-gathered over the *data* axis
    (they are tiny: C x (4B + D*4B)) so every model shard sees the full
    update stream — the TPU analog of the reference broadcasting indices to
    all of a table's DPUs (emb_host.h:258-263);
  * each model shard applies only the updates it owns (ownership mask for
    ROW/TABLE_WISE, dim slice for COLUMN), via an XLA scatter-add with
    out-of-bounds drop semantics;
  * supported optimizers: plain SGD and row-wise AdaGrad (per-row scalar
    accumulator — the standard memory-efficient choice for embedding
    tables).

The input/output fused table aliases through donate_argnums at the jit
boundary above (models/sparse_train.py), so the update is in-place in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ShardingPolicy
from .collection import EmbeddingCollection, routed_bucket_k
from .mesh import DATA_AXIS, MODEL_AXIS
from jax import shard_map
from jax.sharding import PartitionSpec as P


def _entry_updates(g_idx, mask, g_pooled, pooling):
    """Flatten [T, B*L] entries -> (C, D) update rows + (C,) target ids.

    g_pooled [B, T, D] is d(loss)/d(pooled); each entry (t, b, l) with
    mask set receives the full bag cotangent (sum-pool backward).
    """
    t, c = g_idx.shape
    b = c // pooling
    d = g_pooled.shape[-1]
    g_e = jnp.transpose(g_pooled, (1, 0, 2))[:, :, None, :]  # [T, B, 1, D]
    g_e = jnp.broadcast_to(g_e, (t, b, pooling, d)).reshape(t, c, d)
    g_e = g_e * mask[..., None].astype(g_e.dtype)
    return g_idx.reshape(-1), g_e.reshape(t * c, d), mask.reshape(-1)


def _entry_updates_csr(g_idx, offsets, g_pooled):
    """CSR form of _entry_updates: bag membership from offsets instead of a
    static pooling factor (the variable-length analog the reference's wire
    shape implies, emb_host.h:234).  Each valid entry gathers its bag's
    cotangent row (sum-pool backward); padding entries (position >=
    offsets[-1]) get a zero update and valid=False.

    g_idx [T, C]; offsets [T, B+1] local to this entry window;
    g_pooled [B, T, D].  Returns (ids [T*C], updates [T*C, D], valid [T*C]).
    """
    from ..ops.ragged import segment_ids_from_offsets

    t, c = g_idx.shape
    b = g_pooled.shape[0]
    seg = jax.vmap(
        lambda o: segment_ids_from_offsets(o, c)
    )(offsets).astype(jnp.int32)  # [T, C]; padding -> b
    valid = seg < b
    g_t = jnp.transpose(g_pooled, (1, 0, 2))  # [T, B, D]
    g_e = jnp.take_along_axis(
        g_t, jnp.minimum(seg, b - 1)[..., None], axis=1
    )  # [T, C, D]
    g_e = g_e * valid[..., None].astype(g_e.dtype)
    return g_idx.reshape(-1), g_e.reshape(t * c, -1), valid.reshape(-1)


def _scatter_step(emb_shard, local, step, pack):
    """Scatter-add per-entry steps [C, D] at fused-local row ids ``local``
    (already clamped to oob=rows_per_shard for dropped entries).

    pack>1: the shard stores [rows_per_shard/pack, pack*D]; expand each
    D-lane step into its 128-lane storage row via an outer product with the
    lane-group one-hot, then scatter at local//pack (oob maps exactly to
    the storage row count — still dropped)."""
    if pack == 1:
        return emb_shard.at[local].add(
            step.astype(emb_shard.dtype), mode="drop"
        )
    goh = jax.nn.one_hot(local % pack, pack, dtype=step.dtype)  # [C, pack]
    upd = jnp.einsum("cp,cd->cpd", goh, step).reshape(step.shape[0], -1)
    return emb_shard.at[local // pack].add(
        upd.astype(emb_shard.dtype), mode="drop"
    )


def _apply_entries(
    emb_shard,
    acc_shard,
    ids,
    updates,
    valid,
    *,
    rows_per_shard: int,
    pack: int,
    row_offset_from_axis: bool,
    strided: bool,
    num_shards: int,
    lr: float,
    eps: float,
    use_adagrad: bool,
    psum_sq_over_model: bool,
):
    """Broadcast (ownership-masked) scatter step over a flat entry stream
    (ids [E], updates [E, D], valid [E]) — every shard scans all E entries
    and drops the ones it does not own."""
    from .collection import _owner_local

    if row_offset_from_axis:
        shard = jax.lax.axis_index(MODEL_AXIS)
        owner, local = _owner_local(ids, rows_per_shard, num_shards, strided)
        owned = (owner == shard) & (local < rows_per_shard) & valid
    else:
        local = ids
        owned = (local >= 0) & (local < rows_per_shard) & valid
    oob = rows_per_shard  # scatter mode=drop discards out-of-range rows
    local = jnp.where(owned, local, oob)
    # NOTE on sorting: fully-random scatter ids run ~1.8x faster when
    # pre-sorted (tools/kernel_lab.py --only scatter), but measured END TO
    # END the argsort + update permute made the train step ~20% SLOWER —
    # training entries arrive grouped by table (partially sorted by fused
    # offset) so the locality is already there.  Keep the natural order.
    if use_adagrad:
        # row-wise adagrad: acc[r] += mean_d(g^2); step = lr/sqrt(acc+eps).
        # acc is 1-D [rows] (per FUSED row even when storage is packed) —
        # a [rows, 1] buffer would relayout catastrophically on TPU (see
        # EmbeddingCollection.init docstring).
        sq = jnp.mean(updates * updates, axis=-1)  # [C]
        if psum_sq_over_model:
            sq = jax.lax.psum(sq, MODEL_AXIS) / jax.lax.psum(
                jnp.ones((), sq.dtype), MODEL_AXIS
            )
        acc_shard = acc_shard.at[local].add(sq, mode="drop")
        rows_acc = jnp.take(acc_shard, jnp.minimum(local, rows_per_shard - 1))
        scale = lr * jax.lax.rsqrt(rows_acc + eps)  # [C]
        emb_shard = _scatter_step(emb_shard, local, -scale[:, None] * updates, pack)
    else:
        emb_shard = _scatter_step(emb_shard, local, -lr * updates, pack)
    return emb_shard, acc_shard


def _routed_apply_entries(
    emb_shard,
    acc_shard,
    ids,
    updates,
    valid,
    *,
    rows_per_shard: int,
    pack: int,
    strided: bool,
    num_shards: int,
    cf: float,
    lr: float,
    eps: float,
    use_adagrad: bool,
):
    """All-to-all ROUTED optimizer step (ROW/ROW_HASH/TABLE_WISE) over a
    flat entry stream (ids [E], updates [E, D], valid [E]).

    The broadcast step makes every model shard scan all E entries and
    scatter with ownership-drop — per-shard scatter count stays E.  Here
    each device takes an E/M slice, routes (local-id, update-row) pairs to
    the owner shard through capacity-bucketed all_to_alls (SURVEY.md §7
    hard part (a): 'all-to-all of (id, grad) pairs, then on-shard
    segment-sum'), and each shard scatters only the ~cf*E/M entries it
    owns.  Capacity overflow DROPS updates — impossible at the default
    safe capacity factor, counted in-graph otherwise (see lookup_routed).
    Returns (emb_shard, acc_shard, dropped-scalar)."""
    from .collection import _owner_local

    m = num_shards
    mi = jax.lax.axis_index(MODEL_AXIS)
    e_total = ids.shape[0]
    em = -(-e_total // m)
    pad = em * m - e_total
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        updates = jnp.concatenate(
            [updates, jnp.zeros((pad, updates.shape[-1]), updates.dtype)]
        )
    gs = jax.lax.dynamic_slice_in_dim(ids, mi * em, em)
    vs = jax.lax.dynamic_slice_in_dim(valid, mi * em, em)
    us = jax.lax.dynamic_slice_in_dim(updates, mi * em, em)

    owner, local = _owner_local(gs, rows_per_shard, m, strided)
    owner = jnp.clip(owner, 0, m - 1)
    oh = (jax.nn.one_hot(owner, m, dtype=jnp.int32)
          * vs[:, None].astype(jnp.int32))
    pos = jnp.take_along_axis(
        jnp.cumsum(oh, axis=0) - oh, owner[:, None], axis=1
    )[:, 0]
    k = routed_bucket_k(em, cf, m)
    ok = vs & (pos < k)
    slot = jnp.where(ok, owner * k + pos, m * k)
    # silently-lost gradient updates are the worst failure mode: count drops
    # in-graph (zero by construction at the safe default cf)
    dropped = jax.lax.psum(jnp.sum(vs & ~ok, dtype=jnp.int32), MODEL_AXIS)

    send_ids = jnp.full((m * k,), rows_per_shard, dtype=gs.dtype)
    send_ids = send_ids.at[slot].set(local, mode="drop")
    send_upd = jnp.zeros((m * k, us.shape[-1]), us.dtype)
    send_upd = send_upd.at[slot].set(us, mode="drop")
    recv_ids = jax.lax.all_to_all(
        send_ids.reshape(m, k), MODEL_AXIS, split_axis=0, concat_axis=0
    ).reshape(m * k)
    recv_upd = jax.lax.all_to_all(
        send_upd.reshape(m, k, -1), MODEL_AXIS, split_axis=0, concat_axis=0
    ).reshape(m * k, -1)

    rl = jnp.where(recv_ids < rows_per_shard, recv_ids, rows_per_shard)
    if use_adagrad:
        sq = jnp.mean(recv_upd * recv_upd, axis=-1)  # 0 for empty slots
        acc_shard = acc_shard.at[rl].add(sq, mode="drop")
        rows_acc = jnp.take(acc_shard, jnp.minimum(rl, rows_per_shard - 1))
        scale = lr * jax.lax.rsqrt(rows_acc + eps)
        emb_shard = _scatter_step(emb_shard, rl, -scale[:, None] * recv_upd, pack)
    else:
        emb_shard = _scatter_step(emb_shard, rl, -lr * recv_upd, pack)
    return emb_shard, acc_shard, dropped


def _gather_entries_over_data(g_idx, mask, g_pooled):
    g_idx = jax.lax.all_gather(g_idx, DATA_AXIS, axis=1, tiled=True)  # [T, C]
    mask = jax.lax.all_gather(mask, DATA_AXIS, axis=1, tiled=True)
    g_pooled = jax.lax.all_gather(g_pooled, DATA_AXIS, axis=0, tiled=True)
    return g_idx, mask, g_pooled


def sparse_update(
    coll: EmbeddingCollection,
    fused: jax.Array,
    acc: jax.Array,  # [total_rows(, shard dim slice), 1] adagrad accumulator
    indices: jax.Array,  # [T, B*L] local (per-table) ids
    mask: jax.Array,  # [T, B*L]
    g_pooled: jax.Array,  # [B, T, D]
    *,
    lr: float,
    optimizer: str = "sgd",  # "sgd" | "row_adagrad"
    eps: float = 1e-8,
    routed: bool = False,
    capacity_factor: float | None = None,
    return_stats: bool = False,
) -> tuple[jax.Array, jax.Array] | tuple[jax.Array, jax.Array, jax.Array]:
    """Scatter-apply the embedding optimizer step.  Returns (fused, acc),
    or (fused, acc, dropped) with ``return_stats=True``.

    ``routed=True`` (ROW/ROW_HASH/TABLE_WISE only) routes (id, update)
    pairs to owner shards via all_to_all instead of broadcasting — each
    shard scatters ~cf*E/M entries instead of E (see _routed_apply_local).
    ``capacity_factor=None`` resolves to ``coll.safe_capacity_factor``:
    overflow drops (silently lost gradient updates) are then IMPOSSIBLE;
    an explicit lower cf is the throughput mode and drops are counted
    in-graph — check them via ``return_stats=True``."""
    policy = coll.layout.policy
    pooling = indices.shape[1] // g_pooled.shape[0]
    g_idx = coll.globalize(indices)
    use_adagrad = optimizer == "row_adagrad"
    mesh = coll.mesh
    rps = coll.layout.rows_per_shard
    column = policy == ShardingPolicy.COLUMN
    rowish = policy in (
        ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE
    )

    emb_spec = (
        P(None, MODEL_AXIS) if column
        else P(MODEL_AXIS, None) if rowish
        else P()
    )
    acc_spec = P(MODEL_AXIS) if rowish else P()  # acc is 1-D [rows]
    g_spec = P(DATA_AXIS, None, MODEL_AXIS) if column else P(DATA_AXIS, None, None)

    if routed and not rowish:
        raise ValueError("routed sparse_update needs ROW/ROW_HASH/TABLE_WISE")

    def fn(emb_shard, acc_shard, g_idx_s, mask_s, g_s):
        g_idx_g, mask_g, g_g = _gather_entries_over_data(g_idx_s, mask_s, g_s)
        ids, updates, valid = _entry_updates(g_idx_g, mask_g, g_g, pooling)
        if routed:
            return _routed_apply_entries(
                emb_shard, acc_shard, ids, updates, valid,
                rows_per_shard=rps,
                pack=coll.layout.pack,
                strided=coll.layout.policy == ShardingPolicy.ROW_HASH,
                num_shards=coll.layout.num_shards,
                cf=coll._resolve_cf(capacity_factor),
                lr=lr, eps=eps, use_adagrad=use_adagrad,
            )
        emb_shard, acc_shard = _apply_entries(
            emb_shard, acc_shard, ids, updates, valid,
            rows_per_shard=rps if rowish else coll.layout.total_rows,
            pack=coll.layout.pack,
            row_offset_from_axis=rowish,
            strided=coll.layout.policy == ShardingPolicy.ROW_HASH,
            num_shards=coll.layout.num_shards,
            lr=lr, eps=eps, use_adagrad=use_adagrad,
            psum_sq_over_model=column and use_adagrad,
        )
        # broadcast path never drops (scatter sees every entry on every shard)
        return emb_shard, acc_shard, jnp.zeros((), jnp.int32)

    fused, acc, dropped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            emb_spec,
            acc_spec,
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
            g_spec,
        ),
        out_specs=(emb_spec, acc_spec, P()),
        # The data-axis replication of the updated shards holds by
        # construction (every data shard scatters the identical all-gathered
        # entry stream) but is beyond shard_map's static checker — verified
        # by probe: check_vma=True raises "can't be statically inferred"
        # here under every policy.  The claim is pinned numerically by
        # tests/test_sparse_train.py (exact parity vs the dense backward),
        # so this site stays unchecked even under PEL_CHECK_VMA=1.
        check_vma=False,
    )(fused, acc, g_idx, mask, g_pooled)
    if return_stats:
        return fused, acc, dropped
    return fused, acc


def sparse_update_csr(
    coll: EmbeddingCollection,
    fused: jax.Array,
    acc: jax.Array,
    indices: jax.Array,  # [T, C] flat local ids ([T, Nd*Cd] data_sharded)
    offsets: jax.Array,  # [T, B+1] bag offsets ([T, Nd*(Bd+1)] data_sharded)
    g_pooled: jax.Array,  # [B, T, D] d(loss)/d(pooled-SUM)
    *,
    lr: float,
    optimizer: str = "sgd",  # "sgd" | "row_adagrad"
    eps: float = 1e-8,
    routed: bool = False,
    data_sharded: bool = False,
    capacity_factor: float | None = None,
    return_stats: bool = False,
) -> tuple[jax.Array, jax.Array] | tuple[jax.Array, jax.Array, jax.Array]:
    """CSR (ragged-bag) form of ``sparse_update``: variable-length bags get
    their cotangent by segment-gather from the offsets instead of the dense
    path's static-L bag expansion — the backward of ``lookup_csr`` with
    SUM pooling, on the reference's native wire shape (emb_host.h:234).

    ``data_sharded`` follows the lookup_csr contract (per-shard entry
    windows with window-local offsets); entry streams all-gather over the
    data axis before applying so every model shard sees the full batch.
    ``routed=True`` routes (id, update) pairs through the capacity-bucketed
    all_to_all — drop-impossible at the default capacity factor, counted
    in-graph below it (``return_stats=True`` for the counter)."""
    policy = coll.layout.policy
    rowish = policy in (
        ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE
    )
    if routed and not rowish:
        raise ValueError("routed sparse_update_csr needs ROW/ROW_HASH/TABLE_WISE")
    if policy == ShardingPolicy.COLUMN:
        raise ValueError(
            "sparse_update_csr: COLUMN sharding not supported (use the dense "
            "form or a rowish policy)"
        )
    g_idx = coll.globalize(indices)
    use_adagrad = optimizer == "row_adagrad"
    rps = coll.layout.rows_per_shard

    emb_spec = P(MODEL_AXIS, None) if rowish else P()
    acc_spec = P(MODEL_AXIS) if rowish else P()
    q_spec = P(None, DATA_AXIS) if data_sharded else P()
    g_spec = P(DATA_AXIS, None, None) if data_sharded else P()

    def fn(emb_shard, acc_shard, g_idx_s, off_s, g_s):
        ids, updates, valid = _entry_updates_csr(g_idx_s, off_s, g_s)
        if data_sharded:
            # every model shard needs the full batch's entry stream; the
            # replicated form already has it on each device
            ids = jax.lax.all_gather(ids, DATA_AXIS, axis=0, tiled=True)
            updates = jax.lax.all_gather(updates, DATA_AXIS, axis=0, tiled=True)
            valid = jax.lax.all_gather(valid, DATA_AXIS, axis=0, tiled=True)
        if routed:
            return _routed_apply_entries(
                emb_shard, acc_shard, ids, updates, valid,
                rows_per_shard=rps,
                pack=coll.layout.pack,
                strided=policy == ShardingPolicy.ROW_HASH,
                num_shards=coll.layout.num_shards,
                cf=coll._resolve_cf(capacity_factor),
                lr=lr, eps=eps, use_adagrad=use_adagrad,
            )
        emb_shard, acc_shard = _apply_entries(
            emb_shard, acc_shard, ids, updates, valid,
            rows_per_shard=rps if rowish else coll.layout.total_rows,
            pack=coll.layout.pack,
            row_offset_from_axis=rowish,
            strided=policy == ShardingPolicy.ROW_HASH,
            num_shards=coll.layout.num_shards,
            lr=lr, eps=eps, use_adagrad=use_adagrad,
            psum_sq_over_model=False,
        )
        return emb_shard, acc_shard, jnp.zeros((), jnp.int32)

    fused, acc, dropped = shard_map(
        fn,
        mesh=coll.mesh,
        in_specs=(emb_spec, acc_spec, q_spec, q_spec, g_spec),
        out_specs=(emb_spec, acc_spec, P()),
        # same replication-by-construction argument as sparse_update: every
        # data row applies the identical (all-gathered or replicated) entry
        # stream; pinned numerically by tests/test_csr_update.py
        check_vma=False,
    )(fused, acc, g_idx, offsets.astype(jnp.int32), g_pooled)
    if return_stats:
        return fused, acc, dropped
    return fused, acc


def init_accumulator(coll: EmbeddingCollection) -> jax.Array:
    """Row-wise adagrad accumulator (1-D [rows]), sharded like table rows."""
    rowish = coll.layout.policy in (
        ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE
    )
    spec = P(MODEL_AXIS) if rowish else P()
    sharding = jax.sharding.NamedSharding(coll.mesh, spec)
    return jax.jit(
        lambda: jnp.zeros((coll.layout.total_rows,), jnp.float32),
        out_shardings=sharding,
    )()
