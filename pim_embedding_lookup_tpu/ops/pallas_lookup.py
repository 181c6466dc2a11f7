"""Fused DMA-gather + sum-pool Pallas (Mosaic) kernel.

TPU-native re-design of the reference's DPU kernel
(upmem/src/dpu/emb_dpu_lookup.c):

  reference (UPMEM)                        this kernel (TPU)
  -----------------------------------     ---------------------------------
  MRAM->WRAM staged index/offset reads     scalar-prefetched indices/offsets
    (emb_dpu_lookup.c:41-58)                 in SMEM (PrefetchScalarGridSpec)
  per-tasklet batch striding               grid over batch tiles
    (emb_dpu_lookup.c:106)
  8B-aligned mram_read of one row pair     pipelined HBM->VMEM row DMAs,
    (emb_dpu_lookup.c:112-114)               NBUF outstanding copies
  int32 accumulate into WRAM tmp_results   fp32 accumulate into VMEM scratch
    (emb_dpu_lookup.c:114)
  chunked mram_write writeback             block write of the output tile
    (emb_dpu_lookup.c:118-123)

The gather is memory-latency bound for small dims; throughput comes from
keeping many row DMAs in flight (the analog of 14 tasklets keeping the MRAM
bank busy).  The backward pass — which the inference-only reference never
implements — is an XLA scatter-add registered through jax.custom_vjp.

STATUS (r2, measured on hardware — docs/PERF.md "Pallas kernel status"):
the manually-issued per-row DMA costs ~30ns even with 64 in flight, vs
~16-21ns/entry for XLA's hardware gather engine, so the kernel plateaus
~1.6x BEHIND the production XLA packed gather at the Criteo-Kaggle shape
(6.9ms vs 4.4ms per 213k-entry call).  It is therefore NOT dispatched from
``parallel/``; it remains the correctness/reference kernel (interpret-mode
race oracle, tests/test_pallas.py) and the vehicle for future fused paths.
The CSR forms scalar-prefetch whole [C] arrays into SMEM and only compile
at small shapes; ``pallas_embedding_bag_fixedl`` streams per-tile index
blocks and is the form that compiles at production sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ragged import segment_ids_from_offsets


def _make_kernel(tile_b: int, nbuf: int):
    def kernel(idx_ref, off_ref, seg_ref, table_ref, out_ref, acc, rowbuf, sems):
        t = pl.program_id(0)
        b0 = t * tile_b
        start = off_ref[b0]
        end = off_ref[b0 + tile_b]
        acc[:] = jnp.zeros_like(acc)

        def row_dma(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i], 1), :],
                rowbuf.at[slot],
                sems.at[slot],
            )

        # Warm-up: fill the pipeline with up to nbuf outstanding row copies.
        def warm(j, _):
            @pl.when(start + j < end)
            def _():
                row_dma(start + j, j % nbuf).start()

            return 0

        jax.lax.fori_loop(0, nbuf, warm, 0)

        def body(i, _):
            slot = jax.lax.rem(i - start, nbuf)
            row_dma(i, slot).wait()
            b = seg_ref[i] - b0
            acc[pl.ds(b, 1), :] += rowbuf[slot]
            # Refill this slot only after its row has been consumed (WAR-safe:
            # the accumulate above is program-ordered before this start).
            @pl.when(i + nbuf < end)
            def _():
                row_dma(i + nbuf, slot).start()

            return 0

        jax.lax.fori_loop(start, end, body, 0, unroll=False)
        out_ref[:] = acc[:]

    return kernel


def _make_packed_kernel(tile_b: int, nbuf: int, pack: int, d: int):
    """Lane-packed variant for d < 128: the table is stored as
    [ceil(N/pack), 128] with ``pack = 128 // d`` consecutive rows per
    128-lane vector (the TPU mirror of the reference's 8-byte read-pair
    trick, emb_dpu_lookup.c:112-114: MRAM reads are 8B-aligned so the DPU
    fetches two 4B values and selects read_buff[ind%2]).  Each entry DMAs
    one packed [1, 128] vector, masks the owning lane group, and
    accumulates; the caller unpacks by summing lane groups.
    """

    def kernel(idx_ref, off_ref, seg_ref, table_ref, out_ref, acc, rowbuf, sems):
        t = pl.program_id(0)
        b0 = t * tile_b
        start = off_ref[b0]
        end = off_ref[b0 + tile_b]
        acc[:] = jnp.zeros_like(acc)
        lane_group = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // d

        def row_dma(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[i] // pack, 1), :],
                rowbuf.at[slot],
                sems.at[slot],
            )

        def warm(j, _):
            @pl.when(start + j < end)
            def _():
                row_dma(start + j, j % nbuf).start()

            return 0

        jax.lax.fori_loop(0, nbuf, warm, 0)

        def body(i, _):
            slot = jax.lax.rem(i - start, nbuf)
            row_dma(i, slot).wait()
            grp = jax.lax.rem(idx_ref[i], pack)
            b = seg_ref[i] - b0
            sel = (lane_group == grp).astype(jnp.float32)
            acc[pl.ds(b, 1), :] += rowbuf[slot] * sel

            @pl.when(i + nbuf < end)
            def _():
                row_dma(i + nbuf, slot).start()

            return 0

        jax.lax.fori_loop(start, end, body, 0, unroll=False)
        out_ref[:] = acc[:]

    return kernel


def pack_table_lanes(table: jax.Array) -> jax.Array:
    """[N, D] -> [ceil(N/pack), 128] lane-packed storage (D must divide 128).
    Do this ONCE at table-init time for the packed pallas path — it is a
    full-table copy."""
    n, d = table.shape
    pack = 128 // d
    npad = -(-n // pack) * pack
    padded = jnp.pad(table, ((0, npad - n), (0, 0)))
    return padded.reshape(npad // pack, 128)


def _pallas_sum_csr(
    table: jax.Array,  # [N, D] float
    indices: jax.Array,  # [C] int32
    offsets: jax.Array,  # [B+1] int32
    seg_ids: jax.Array,  # [C] int32 (precomputed bag id per entry)
    *,
    padded_batch: int,
    tile_b: int,
    nbuf: int,
) -> jax.Array:  # [padded_batch, D]
    d = table.shape[1]
    grid = (padded_batch // tile_b,)
    if d % 128 == 0:
        kernel = _make_kernel(tile_b, nbuf)
        table_in = table.astype(jnp.float32)
        out_d = d
    elif 128 % d == 0:
        pack = 128 // d
        kernel = _make_packed_kernel(tile_b, nbuf, pack, d)
        table_in = pack_table_lanes(table.astype(jnp.float32))
        out_d = 128
    else:
        raise NotImplementedError(f"pallas path needs d%128==0 or 128%d==0, got {d}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # indices, offsets, seg_ids
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec(
            (tile_b, out_d), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, out_d), jnp.float32),  # acc
            pltpu.VMEM((nbuf, 1, out_d), jnp.float32),  # row landing buffers
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_batch, out_d), jnp.float32),
    )(indices, offsets, seg_ids, table_in)
    if out_d != d:
        # collapse lane groups: each acc row holds pack interleaved copies
        out = out.reshape(padded_batch, out_d // d, d).sum(axis=1)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bag_sum(table, indices, offsets, batch_size, tile_b, nbuf):
    capacity = indices.shape[0]
    padded_batch = -(-batch_size // tile_b) * tile_b
    # Pad offsets with empty trailing bags so every grid tile is full.
    off_pad = jnp.full((padded_batch + 1 - offsets.shape[0],), offsets[-1], offsets.dtype)
    offsets_p = jnp.concatenate([offsets, off_pad])
    seg_ids = segment_ids_from_offsets(offsets, capacity).astype(jnp.int32)
    out = _pallas_sum_csr(
        table,
        indices.astype(jnp.int32),
        offsets_p.astype(jnp.int32),
        seg_ids,
        padded_batch=padded_batch,
        tile_b=tile_b,
        nbuf=nbuf,
    )
    return out[:batch_size].astype(table.dtype)


def _bag_sum_fwd(table, indices, offsets, batch_size, tile_b, nbuf):
    out = _bag_sum(table, indices, offsets, batch_size, tile_b, nbuf)
    # table is saved only for its shape/dtype (same buffer, no copy).
    return out, (table, indices, offsets)


def _bag_sum_bwd(batch_size, tile_b, nbuf, res, g):
    table, indices, offsets = res
    table_shape, table_dtype = table.shape, table.dtype
    capacity = indices.shape[0]
    seg_ids = segment_ids_from_offsets(offsets, capacity)
    valid = seg_ids < batch_size
    # dL/dtable[r] = sum over entries e with indices[e]==r of g[seg(e)].
    # Scatter-add of per-entry cotangents — the sparse-grad path the
    # reference lacks (it is inference-only, SURVEY.md §2b).
    g_entries = jnp.where(
        valid[:, None], jnp.take(g, jnp.minimum(seg_ids, batch_size - 1), axis=0), 0.0
    )
    dtable = jnp.zeros(table_shape, dtype=table_dtype).at[indices].add(
        g_entries.astype(table_dtype)
    )
    return (dtable, None, None)


_bag_sum.defvjp(_bag_sum_fwd, _bag_sum_bwd)


def pallas_embedding_bag_csr(
    table: jax.Array,  # [N, D]
    indices: jax.Array,  # [C]
    offsets: jax.Array,  # [B+1]
    *,
    batch_size: int,
    tile_b: int = 8,
    nbuf: int = 8,
) -> jax.Array:  # [B, D]
    """SUM-pooled CSR embedding bag via the fused Pallas kernel.

    tile_b: bags per grid step (sublane-aligned).  nbuf: outstanding row DMAs
    — the analog of NR_TASKLETS=14 concurrent MRAM streams (run.sh:44).

    For dim < 128 this lane-packs the table INSIDE the call — a full-table
    copy per invocation.  Production callers with persistent packed storage
    should use :func:`pallas_embedding_bag_csr_packed` instead.
    """
    return _bag_sum(table, indices, offsets, batch_size, tile_b, nbuf)


def _make_fixedl_kernel(tile_b: int, L: int, nbuf: int, pack: int, d: int):
    """Fixed-pooling-factor gather+pool over packed [S, 128] storage.

    Unlike the CSR kernels, the per-tile indices arrive as a streamed SMEM
    BLOCK (tile_b*L int32 per grid step) instead of a whole-array scalar
    prefetch — the CSR form's SMEM prefetch of [C]-sized arrays overflows
    scalar memory at production shapes (213k entries = 2.5MB >> SMEM) and
    kills the Mosaic compile.  The entry loop is static (tile_b*L) so it
    fully unrolls; ``nbuf`` row DMAs stay in flight (the NR_TASKLETS=14
    analog, emb_dpu_lookup.c:106)."""
    e = tile_b * L
    e8 = e // 8  # index blocks are [8, e8] (Mosaic block tiling rule)

    def kernel(idx_ref, msk_ref, table_ref, out_ref, acc, rowbuf, sems):
        lane_group = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // d

        def idx_at(i):
            return idx_ref[0, i // e8, i % e8]

        def row_dma(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_at(i) // pack, 1), :],
                rowbuf.at[slot],
                sems.at[slot],
            )

        for j in range(min(nbuf, e)):
            row_dma(j, j).start()
        acc[:] = jnp.zeros_like(acc)
        for i in range(e):
            slot = i % nbuf
            row_dma(i, slot).wait()
            row = rowbuf[slot]
            valid = msk_ref[0, i // e8, i % e8].astype(jnp.float32)
            if pack > 1:
                sel = (lane_group == jax.lax.rem(idx_at(i), pack)).astype(
                    jnp.float32
                )
                row = row * (sel * valid)
            else:
                row = row * valid
            b = i // L
            acc[pl.ds(b, 1), :] += row
            if i + nbuf < e:
                row_dma(i + nbuf, slot).start()
        out_ref[:] = acc[:]

    return kernel


def pallas_embedding_bag_fixedl(
    packed: jax.Array,  # [S, 128] lane-packed storage ([N, 128] when d==128)
    d: int,
    indices: jax.Array,  # [B*L] logical row ids, bag-major
    *,
    pooling: int,
    batch_size: int,
    tile_b: int = 8,
    nbuf: int = 16,
    mask: jax.Array | None = None,  # [B*L] entry validity
) -> jax.Array:  # [B, d]
    """SUM-pooled fixed-L embedding bag over pre-packed storage — the
    production-shape-safe pallas path (streamed index blocks, no whole-array
    SMEM prefetch).  Forward-only; training updates ride
    parallel.sparse_update."""
    pack = 128 // d if d < 128 else 1
    assert d == 128 or 128 % d == 0, d
    assert batch_size % tile_b == 0, (batch_size, tile_b)
    e = tile_b * pooling
    assert e % 8 == 0, (tile_b, pooling)
    kernel = _make_fixedl_kernel(tile_b, pooling, nbuf, pack, d)
    grid = (batch_size // tile_b,)
    # 3-D [G, 8, e/8] index stream: Mosaic requires the last two block dims
    # to be (multiple of 8, equal-to-array); (1, e) and rank-1 blocks both
    # fail lowering, and whole-array scalar prefetch (the CSR form) blows
    # SMEM at production sizes (213k entries = 852KB)
    idx3 = indices.astype(jnp.int32).reshape(grid[0], 8, e // 8)
    if mask is None:
        msk3 = jnp.ones_like(idx3)
    else:
        msk3 = mask.astype(jnp.int32).reshape(grid[0], 8, e // 8)
    smem_spec = pl.BlockSpec(
        (1, 8, e // 8), lambda t: (t, 0, 0), memory_space=pltpu.SMEM
    )
    # under shard_map with check_vma, out_shape must carry how the result
    # varies over mesh axes: the pooled output varies wherever the
    # ids/mask/table do (e.g. data axis for batch sharding, model axis for
    # ownership-masked row shards)
    try:
        vma = (jax.typeof(idx3).vma | jax.typeof(msk3).vma
               | jax.typeof(packed).vma)
        out_sds = jax.ShapeDtypeStruct((batch_size, 128), jnp.float32,
                                       vma=vma)
    except (AttributeError, TypeError):
        out_sds = jax.ShapeDtypeStruct((batch_size, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem_spec,
            smem_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (tile_b, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, 128), jnp.float32),
            pltpu.VMEM((nbuf, 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        out_shape=out_sds,
    )(idx3, msk3, packed.astype(jnp.float32))
    if d != 128:
        out = out.reshape(batch_size, 128 // d, d).sum(axis=1)
    return out


def pallas_embedding_bag_csr_packed(
    packed: jax.Array,  # [S, 128] lane-packed storage (pack = 128 // d rows)
    d: int,  # logical row dim
    indices: jax.Array,  # [C] logical row ids
    offsets: jax.Array,  # [B+1]
    *,
    batch_size: int,
    tile_b: int = 8,
    nbuf: int = 8,
) -> jax.Array:  # [B, d]
    """SUM-pooled CSR bag over PRE-PACKED [S, 128] storage (see
    :func:`pack_table_lanes` / FusedLayout.pack) — no per-call repack, so the
    table stays a jit argument at its stored shape (docs/PERF.md rule 3:
    never pad/reshape a [N, d<128] array on-device).  Forward-only: the
    training path updates packed storage through
    parallel.sparse_update (entry scatter-add), not autodiff.
    """
    if d == 128:
        kernel = _make_kernel(tile_b, nbuf)
    else:
        assert 128 % d == 0, f"packed path needs 128 % d == 0, got {d}"
        kernel = _make_packed_kernel(tile_b, nbuf, 128 // d, d)
    padded_batch = -(-batch_size // tile_b) * tile_b
    off_pad = jnp.full(
        (padded_batch + 1 - offsets.shape[0],), offsets[-1], offsets.dtype
    )
    offsets_p = jnp.concatenate([offsets, off_pad]).astype(jnp.int32)
    capacity = indices.shape[0]
    seg_ids = segment_ids_from_offsets(offsets, capacity).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(padded_batch // tile_b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_b, 128), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, 128), jnp.float32),
            pltpu.VMEM((nbuf, 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_batch, 128), jnp.float32),
    )(indices.astype(jnp.int32), offsets_p, seg_ids, packed.astype(jnp.float32))
    if d != 128:
        out = out.reshape(padded_batch, 128 // d, d).sum(axis=1)
    return out[:batch_size]
