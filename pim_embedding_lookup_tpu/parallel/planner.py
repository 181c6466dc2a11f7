"""Table placement planner: decides how each table collection is laid out
over the mesh's model axis and builds the fused-storage layout.

The reference's placement is hardwired: DPU id = table_id * NR_COLS + col
(emb_host.h:167), i.e. every table column gets one DPU and tables must fit
a 14MB MRAM slice (emb_types.h:5) — oversize tables are simply unsupported
(row-sharding is dead scaffolding there, emb_host.h:124-134).  Here placement
is a planning step over real policies:

* REPLICATE  — small collections: every model-shard holds all rows.
* ROW        — fused rows split equally across shards; lookups mask by
               ownership and psum partial pools.
* COLUMN     — embedding dim split across shards (the true analog of the
               reference's per-column DPUs); no reduction needed.
* TABLE_WISE — whole tables bin-packed onto shards (reference's primary
               strategy); realized as ROW sharding whose split points align
               with table boundaries, so it shares the ROW kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from ..config import ShardingPolicy, TableConfig

# AUTO thresholds
REPLICATE_MAX_BYTES = 128 << 20  # collections under 128MB replicate
COLUMN_MIN_DIM_PER_SHARD = 128   # keep lane-aligned column shards


@dataclasses.dataclass(frozen=True)
class FusedLayout:
    """Fused storage plan for a collection of same-dim tables.

    Tables live stacked in one [total_rows, dim] array; table t's row r is
    fused row ``row_offsets[t] + r``.  ``total_rows`` is padded so the model
    axis divides it evenly (XLA equal-shard constraint).

    When ``pack > 1`` (lane packing, dim < 128 and 128 % dim == 0) the
    physical storage is ``[total_rows/pack, dim*pack]``: ``pack``
    consecutive fused rows share one 128-lane storage row, and fused row g
    lives at storage row ``g // pack``, lane group ``g % pack``.  TPU random
    gathers are issue-rate bound (~16-26ns/row regardless of row width,
    docs/PERF.md), so fetching 128 useful lanes per issue instead of ``dim``
    cuts the gather cost up to ``pack``x — the TPU analog of the DPU
    kernel's 8-byte read-pair trick (emb_dpu_lookup.c:112-114, which reads
    two 4B values per aligned MRAM transfer and selects with ind%2).
    """

    policy: ShardingPolicy
    dim: int
    num_shards: int
    row_offsets: tuple[int, ...]  # [T] fused start row per table
    table_rows: tuple[int, ...]  # [T] logical rows per table
    total_rows: int  # padded fused row count
    pack: int = 1  # fused rows per 128-lane storage row

    @property
    def rows_per_shard(self) -> int:
        return self.total_rows // self.num_shards

    @property
    def num_tables(self) -> int:
        return len(self.row_offsets)

    @property
    def storage_rows(self) -> int:
        return self.total_rows // self.pack

    @property
    def storage_width(self) -> int:
        return self.dim * self.pack


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_pack(dim: int, policy: ShardingPolicy, packed) -> int:
    """Lane-pack factor for (dim, policy).  ``packed``: False, True, "auto".

    Packing needs 128 % dim == 0 with dim < 128, and is incompatible with
    COLUMN sharding (splitting the 128 storage lanes would split lane
    groups, not embedding dims)."""
    supported = dim < 128 and 128 % dim == 0 and policy != ShardingPolicy.COLUMN
    if packed is True:
        if not supported:
            raise ValueError(
                f"packed storage unsupported for dim={dim}, policy={policy}"
            )
        return 128 // dim
    if packed == "auto":
        return 128 // dim if supported else 1
    return 1


def plan(
    tables: Sequence[TableConfig],
    num_shards: int,
    policy: ShardingPolicy = ShardingPolicy.AUTO,
    packed: bool | str = False,
) -> FusedLayout:
    dims = {t.dim for t in tables}
    if len(dims) != 1:
        raise ValueError(f"one collection per dim; got dims {dims}")
    dim = next(iter(dims))
    itemsize = np.dtype(tables[0].dtype).itemsize
    total_bytes = sum(t.num_rows for t in tables) * dim * itemsize

    if policy == ShardingPolicy.AUTO:
        if num_shards == 1 or total_bytes <= REPLICATE_MAX_BYTES:
            policy = ShardingPolicy.REPLICATE
        elif dim % num_shards == 0 and dim // num_shards >= COLUMN_MIN_DIM_PER_SHARD:
            policy = ShardingPolicy.COLUMN
        else:
            # strided (hashed) rows: balanced ownership for every table with
            # >= num_shards rows, and the layout the routed collectives are
            # designed for — strictly better than contiguous ROW for the
            # uniform/zipf id streams this engine serves
            policy = ShardingPolicy.ROW_HASH

    pack = resolve_pack(dim, policy, packed)
    # Storage rows stay sublane(8)-aligned; shard boundaries must also land
    # on storage-row (pack) boundaries so g//pack stays shard-local.
    align = 8 * pack

    table_rows = tuple(t.num_rows for t in tables)

    if policy == ShardingPolicy.TABLE_WISE:
        return _plan_table_wise(table_rows, dim, num_shards, pack, align)

    # Contiguous fused layout; pad total rows so shards split evenly.
    offsets, acc = [], 0
    for t in tables:
        offsets.append(acc)
        acc += t.num_rows
    if policy in (ShardingPolicy.ROW, ShardingPolicy.ROW_HASH):
        # Sublane-align each shard's slice to keep gathers tile-friendly.
        total = _round_up(acc, num_shards * align)
    else:
        total = _round_up(acc, align)
    if policy == ShardingPolicy.COLUMN and dim % num_shards != 0:
        raise ValueError(f"COLUMN sharding needs model|{num_shards} to divide dim={dim}")
    return FusedLayout(
        policy=policy,
        dim=dim,
        num_shards=num_shards,
        row_offsets=tuple(offsets),
        table_rows=table_rows,
        total_rows=total,
        pack=pack,
    )


def _plan_table_wise(
    table_rows: tuple[int, ...], dim: int, num_shards: int,
    pack: int = 1, align: int = 8,
) -> FusedLayout:
    """Greedy bin-pack whole tables onto shards by row count (the balance
    problem the reference solves trivially by giving every table NR_COLS
    DPUs), then pad every shard to the max shard size so XLA's equal-split
    row sharding lands each table wholly on its assigned shard."""
    order = sorted(range(len(table_rows)), key=lambda i: -table_rows[i])
    bins: list[list[int]] = [[] for _ in range(num_shards)]
    loads = [0] * num_shards
    for i in order:
        s = int(np.argmin(loads))
        bins[s].append(i)
        loads[s] += table_rows[i]
    rows_per_shard = _round_up(max(loads), align)
    offsets = [0] * len(table_rows)
    for s, members in enumerate(bins):
        acc = s * rows_per_shard
        for i in members:
            offsets[i] = acc
            acc += table_rows[i]
    return FusedLayout(
        policy=ShardingPolicy.TABLE_WISE,
        dim=dim,
        num_shards=num_shards,
        row_offsets=tuple(offsets),
        table_rows=table_rows,
        total_rows=rows_per_shard * num_shards,
        pack=pack,
    )
