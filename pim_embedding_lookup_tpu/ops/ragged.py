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

import dataclasses
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


# ---------------------------------------------------------------------------
# Length-bucketed CSR: host-side re-wiring of ragged bags into a few
# fixed-L dense dispatches + a residual CSR tail.
#
# The CSR segment reduce pays a "raggedness tax" that is worst at narrow
# dims (measured 2.2x over the dense fixed-L form at the reference's
# canonical dim-16 shape — docs/PERF.md).  The reference itself answers
# raggedness by PADDING every bag to MAX_INDICES_PER_BATCH on the host
# (emb_host.h:30,262): its wire is effectively fixed-L.  This module does
# the shape-adaptive version of that: bags are grouped by length into a
# small set of fixed-L buckets (each dispatched through the measured-fast
# dense kernel), bags longer than the largest bucket ride the generic CSR
# path, and pooled results scatter back to their batch positions.  All
# shapes are STATIC per plan, so one compile serves every batch with the
# same plan — the planner pads capacities with slack for batch-to-batch
# length variation and the packer spills overflow to larger buckets/tail.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LengthBucketPlan:
    """Static shape plan for bucketed CSR dispatch (host-side).

    Bucketing is per BATCH ELEMENT: bag slot b is assigned by its MAX bag
    length across tables, so every table shares one position array and the
    merge scatters B rows of [T*D] lanes — NOT B*T rows (a per-(table,bag)
    merge was measured on chip and its per-row scatter issues ate the
    whole dense-kernel win; see docs/PERF.md).

    ``bucket_ls``: ascending fixed pooling widths; batch element b packs
    into the first bucket with L >= maxlen(b) that has a free slot.
    ``capacities``: slots per bucket, rounded to ``round_to`` so the dense
    dispatch batch-shards over the data axis.
    ``tail_bags``/``tail_entries``: residual-CSR capacity (bags longer
    than bucket_ls[-1] or spilled past full buckets); tail_entries is the
    per-table entry capacity.
    """

    batch: int
    bucket_ls: tuple[int, ...]
    capacities: tuple[int, ...]
    tail_bags: int
    tail_entries: int


@dataclasses.dataclass(frozen=True)
class BucketedCSR:
    """Packed device-ready arrays for one batch under a LengthBucketPlan.

    Per bucket k: idx/mask [T, Bk*Lk], pos [Bk] int32 (sentinel=batch for
    unused slots), SHARED across tables.  Tail: per-table CSR (idx
    [T, tail_entries], off [T, tail_bags+1]) + pos [tail_bags].
    ``identity``: single bucket, no tail, slot j holds batch element j —
    the merge is a no-op slice (the fixed-L fast path).
    """

    plan: LengthBucketPlan
    idx: tuple[np.ndarray, ...]
    mask: tuple[np.ndarray, ...]
    pos: tuple[np.ndarray, ...]
    tail_idx: np.ndarray | None
    tail_off: np.ndarray | None
    tail_pos: np.ndarray | None
    identity: bool


def plan_length_buckets(
    offsets: np.ndarray,  # [T, B+1] (a representative batch)
    bucket_ls: Sequence[int] = (1, 2, 4, 8),
    slack: float = 1.3,
    round_to: int = 8,
) -> LengthBucketPlan:
    """Derive static bucket capacities from a representative batch.

    Capacities take each bucket's batch-element count times ``slack`` (so
    one plan survives batch-to-batch length variation), rounded up to
    ``round_to`` (data-axis divisibility for the dense dispatch).
    All-empty batch elements belong to no bucket (they pool to zero).
    """
    offsets = np.asarray(offsets)
    lens = offsets[:, 1:] - offsets[:, :-1]  # [T, B]
    blen = lens.max(axis=0)  # [B] per-batch-element max length
    b = blen.shape[0]
    ls = tuple(sorted(int(l) for l in bucket_ls))
    if not ls or ls[0] < 1:
        raise ValueError(f"bucket_ls must be positive: {bucket_ls}")

    def rounded(n):
        return -(-int(np.ceil(n)) // round_to) * round_to

    caps = []
    prev = 0
    for l in ls:
        count = int(((blen > prev) & (blen <= l)).sum())
        caps.append(rounded(count * slack) if count else 0)
        prev = l
    tail_sel = blen > ls[-1]
    tail_bags = int(tail_sel.sum())
    tail_entries = int((lens[:, tail_sel].sum(axis=1)).max()) if tail_bags else 0
    if tail_bags:
        tail_bags = rounded(tail_bags * slack)
        tail_entries = int(np.ceil(tail_entries * slack))
    return LengthBucketPlan(
        batch=b,
        bucket_ls=ls,
        capacities=tuple(caps),
        tail_bags=tail_bags,
        tail_entries=tail_entries,
    )


def pack_length_buckets(
    indices: np.ndarray,  # [T, C] flat per-table ids
    offsets: np.ndarray,  # [T, B+1]
    plan: LengthBucketPlan,
    pad_index: int = 0,
    impl: str = "auto",  # auto | native | numpy
) -> BucketedCSR:
    """Pack one batch's CSR bags into the plan's fixed shapes.

    ``impl="auto"`` uses the threaded native packer (native/feeder.cpp
    pel_pack_buckets) when the library is built — the numpy packer's
    7-19 ms/batch dominates the ~1.3 ms device dispatch it feeds, and the
    reference likewise preps its wire buffers in C (emb_host.h:234-268).
    Both packers share one contract (parity: tests/test_bucketed_csr.py).

    A batch element goes to the first bucket with L >= maxlen and a free
    slot; full buckets spill to the next larger bucket, then to the tail
    (which also takes maxlen > bucket_ls[-1]).  Raises ValueError when the
    tail overflows — re-plan with more slack (callers can always fall back
    to plain lookup_csr for that batch).
    """
    _b = np.asarray(offsets).shape[1] - 1
    if _b != plan.batch:  # validate for BOTH packers (the numpy branch
        # re-checks; the native packer would silently mis-pack otherwise)
        raise ValueError(f"batch {_b} != plan batch {plan.batch}")
    if impl != "numpy":
        from ..utils import native as _native

        packed = _native.pack_buckets(
            indices, offsets,
            bucket_ls=plan.bucket_ls, capacities=plan.capacities,
            tail_bags=plan.tail_bags, tail_entries=plan.tail_entries,
            pad_index=pad_index,
        ) if (_native.available() or impl == "native") else None
        if packed is None:
            if impl == "native":
                raise RuntimeError(
                    "native packer requested but libpelfeeder.so not built "
                    "(make -C native)"
                )
        else:
            idx_t, mask_t, pos_t, tail_idx, tail_off, tail_pos = packed
            b = plan.batch
            nonzero = [k for k in range(len(plan.bucket_ls))
                       if plan.capacities[k]]
            tail_used = (
                int((tail_pos < b).sum()) if tail_pos is not None else 0
            )
            identity = (
                tail_used == 0
                and len(nonzero) == 1
                and plan.capacities[nonzero[0]] >= b
                and bool(np.array_equal(pos_t[nonzero[0]][:b], np.arange(b)))
            )
            return BucketedCSR(
                plan=plan, idx=idx_t, mask=mask_t, pos=pos_t,
                tail_idx=tail_idx, tail_off=tail_off, tail_pos=tail_pos,
                identity=identity,
            )
    indices = np.asarray(indices)
    offsets = np.asarray(offsets).astype(np.int64)
    t, b = offsets.shape[0], offsets.shape[1] - 1
    if b != plan.batch:
        raise ValueError(f"batch {b} != plan batch {plan.batch}")
    lens = (offsets[:, 1:] - offsets[:, :-1]).astype(np.int64)  # [T, B]
    blen = lens.max(axis=0)
    ls, caps = plan.bucket_ls, plan.capacities
    nk = len(ls)

    # bucket assignment (per batch element): smallest L >= maxlen; -1 for
    # all-empty elements; nk == tail
    assign = np.searchsorted(np.asarray(ls), blen, side="left").astype(int)
    assign[blen == 0] = -1
    # spill overflow (arrival order) to the next larger bucket / tail
    for k in range(nk):
        sel = np.nonzero(assign == k)[0]
        if len(sel) > caps[k]:
            assign[sel[caps[k]:]] = k + 1
    tail_list = np.nonzero(assign == nk)[0]
    has_tail = plan.tail_bags > 0
    if len(tail_list) > plan.tail_bags:
        raise ValueError(
            f"bucket plan overflow ({len(tail_list)} residual bags > "
            f"tail capacity {plan.tail_bags}) — re-plan with more slack "
            "or fall back to lookup_csr"
        )

    # per-entry coordinates, per table: bag id and within-bag rank
    cap_c = indices.shape[1]
    bagid = np.empty((t, cap_c), np.int64)
    rank = np.empty((t, cap_c), np.int64)
    for ti in range(t):
        n_ent = int(offsets[ti, -1])
        bagid[ti, :n_ent] = np.repeat(np.arange(b), lens[ti])
        bagid[ti, n_ent:] = b  # padding -> sentinel
        p = np.arange(cap_c, dtype=np.int64)
        starts = np.concatenate([offsets[ti, :-1], [cap_c]])
        rank[ti] = p - starts[np.minimum(bagid[ti], b)]

    idx_out, mask_out, pos_out = [], [], []
    slot_of = np.full(b + 1, -1, np.int64)
    for k, l in enumerate(ls):
        bags_k = np.nonzero(assign == k)[0]
        ik = np.full((t, caps[k] * l), pad_index, np.int32)
        mk = np.zeros((t, caps[k] * l), bool)
        pk = np.full(caps[k], b, np.int32)
        pk[: len(bags_k)] = bags_k
        slot_of[:] = -1
        slot_of[bags_k] = np.arange(len(bags_k))
        for ti in range(t):
            sl = slot_of[bagid[ti]]
            put = sl >= 0
            dest = sl[put] * l + rank[ti, put]
            ik[ti, dest] = indices[ti, put]
            mk[ti, dest] = True
        idx_out.append(ik)
        mask_out.append(mk)
        pos_out.append(pk)

    tail_idx = tail_off = tail_pos = None
    if has_tail:
        tail_idx = np.full((t, plan.tail_entries), pad_index, np.int32)
        tail_off = np.zeros((t, plan.tail_bags + 1), np.int32)
        tail_pos = np.full(plan.tail_bags, b, np.int32)
        tail_pos[: len(tail_list)] = tail_list
        slot_of[:] = -1
        slot_of[tail_list] = np.arange(len(tail_list))
        for ti in range(t):
            tl = lens[ti, tail_list]
            toff = np.zeros(len(tail_list) + 1, np.int64)
            np.cumsum(tl, out=toff[1:])
            if toff[-1] > plan.tail_entries:
                raise ValueError(
                    f"bucket plan overflow (table {ti}: {toff[-1]} tail "
                    f"entries > capacity {plan.tail_entries}) — re-plan "
                    "with more slack"
                )
            sl = slot_of[bagid[ti]]
            put = sl >= 0
            dest = toff[sl[put]] + rank[ti, put]
            tail_idx[ti, dest] = indices[ti, put]
            tail_off[ti, 1 : len(tail_list) + 1] = toff[1:]
            tail_off[ti, len(tail_list) + 1 :] = toff[-1]
    # (residual bags with tail capacity 0 already raised at the
    # tail-overflow check above — len(tail_list) > 0 == tail_bags there)

    nonzero = [k for k in range(nk) if caps[k]]
    identity = (
        not len(tail_list)
        and len(nonzero) == 1
        and caps[nonzero[0]] >= b
        and np.array_equal(pos_out[nonzero[0]][:b], np.arange(b))
    )
    return BucketedCSR(
        plan=plan,
        idx=tuple(idx_out),
        mask=tuple(mask_out),
        pos=tuple(pos_out),
        tail_idx=tail_idx,
        tail_off=tail_off,
        tail_pos=tail_pos,
        identity=identity,
    )
