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
    """
    return _bag_sum(table, indices, offsets, batch_size, tile_b, nbuf)
