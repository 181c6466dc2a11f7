"""Headline benchmark: pooled embedding lookups/s/chip at the Criteo-Kaggle
26-table config (BASELINE.json north star).

Methodology mirrors the reference's standalone load generator
(upmem/src/load_generator.c:96-105): populate tables, build random queries,
run a warmed 100-iteration timed lookup loop.  The CPU baseline — torch
EmbeddingBag on the host, the exact engine the reference offloads away from
— provides vs_baseline (the reference publishes no DPU numbers,
BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
Extra detail goes to stderr.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


_T0 = time.time()


def log(*a):
    print(f"[{time.time()-_T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def tpu_lookup_rate(tables, batch, pooling, iters, seed=0, hybrid=True,
                    dtype="float32", packed="auto", quantized=False,
                    mxu_threshold=None, wire="dense", int8_scale="table",
                    csr_ragged=False):
    """Device-honest lookup throughput.

    The timed loop runs IN-GRAPH (lax.fori_loop over `iters` lookups, one
    dispatch): per-iteration query perturbation defeats any host/relay
    execution caching, and a scalar carry forces each iteration's result to
    be consumed.  (A host-side loop re-dispatching 4 rotating buffers
    measured an impossible 31TB/s through this environment's remote tunnel
    — repeated identical executions were being deduped.)
    """
    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh
    from pim_embedding_lookup_tpu.parallel import collection as _coll_mod

    from pim_embedding_lookup_tpu.parallel.hybrid import HybridEmbeddingCollection

    # The pallas gather must stay off inside this in-graph fori_loop
    # (pallas_call in fori_loop fails the remote Mosaic compile —
    # docs/PERF.md rule 4).  collection.PALLAS_GATHER already defaults to
    # "off" and honors PEL_PALLAS_GATHER; just surface a loud note if an
    # env override turned it on (ADVICE r3: no double bookkeeping here).
    if _coll_mod.PALLAS_GATHER != "off":
        log(f"WARNING: PALLAS_GATHER={_coll_mod.PALLAS_GATHER} — pallas in "
            "a fori_loop will fail the remote Mosaic compile (PERF.md rule 4)")

    mesh = make_mesh(MeshConfig(data=1, model=jax.device_count()))
    policy = (
        ShardingPolicy.REPLICATE
        if jax.device_count() == 1
        else ShardingPolicy.ROW_HASH  # balanced ownership (docs/PERF.md)
    )
    quantized = quantized or dtype == "int8"
    table_dtype = jnp.dtype("float32" if dtype == "int8" else dtype)
    if quantized and hybrid:
        # MXU small set + int8 big set: the capacity pairing (emb_types.h:5
        # analog) on the flagship hybrid path
        coll = HybridEmbeddingCollection.create(
            tables, mesh, policy, packed=packed, quantized_big=True,
            int8_scale_mode=int8_scale,
            **({"mxu_threshold": mxu_threshold} if mxu_threshold else {}),
        )
        log(f"layout: hybrid-int8 mxu_tables={len(coll.small_ids)} "
            f"int8_tables={len(coll.big_ids)} scale_mode={int8_scale} "
            f"pack={coll.big.layout.pack if coll.big else 1}")
        params = coll.init(jax.random.PRNGKey(seed))

        def lookup_fn(p, i, m):
            return coll.lookup(p, i, m, batch_size=batch)
    elif quantized:
        # int8 capacity mode: 4x the rows of f32 in the same HBM (the
        # MRAM-slice analog, emb_types.h:5); f32 dequant-accumulate
        from pim_embedding_lookup_tpu.parallel import (
            QuantizedEmbeddingCollection,
        )

        coll = QuantizedEmbeddingCollection.create(
            tables, mesh, policy, packed=packed, scale_mode=int8_scale
        )
        log(f"layout: int8 quantized policy={coll.layout.policy} "
            f"scale_mode={int8_scale} "
            f"total_rows={coll.layout.total_rows} pack={coll.layout.pack}")
        params = coll.init(jax.random.PRNGKey(seed))

        def lookup_fn(p, i, m):
            return coll.lookup(p, i, m, batch_size=batch)
    elif hybrid:
        kw = {}
        if mxu_threshold:
            kw["mxu_threshold"] = mxu_threshold
        coll = HybridEmbeddingCollection.create(tables, mesh, policy,
                                                packed=packed, **kw)
        log(f"layout: hybrid mxu_tables={len(coll.small_ids)} "
            f"gather_tables={len(coll.big_ids)} dtype={dtype} "
            f"pack={coll.big.layout.pack if coll.big else 1}")
        params = coll.init(jax.random.PRNGKey(seed), dtype=table_dtype)

        def lookup_fn(p, i, m):
            return coll.lookup(p, i, m, batch_size=batch)
    else:
        coll = EmbeddingCollection.create(tables, mesh, policy, packed=packed)
        log(f"layout: policy={coll.layout.policy} "
            f"total_rows={coll.layout.total_rows} dtype={dtype} "
            f"pack={coll.layout.pack}")
        params = coll.init(jax.random.PRNGKey(seed), dtype=table_dtype)

        def lookup_fn(p, i, m):
            return coll.lookup(p, i, m, batch_size=batch)
    jax.block_until_ready(params)

    rng = np.random.default_rng(seed)
    t = len(tables)
    capacity = batch * pooling
    offsets_np = None
    if wire in ("csr", "csr-bucketed"):
        if csr_ragged:
            # genuinely ragged bags with mean length ~= pooling: a mixture
            # of empties, short bags, and 4x-pooling outliers (the regime
            # the bucketed dispatch exists for)
            lens = np.zeros((t, batch), np.int64)
            r = rng.random((t, batch))
            lens[r >= 0.10] = np.maximum(
                1, rng.integers(1, pooling + 1, size=(t, batch))
            )[r >= 0.10]
            long_sel = r >= 0.90
            lens[long_sel] = rng.integers(
                2 * pooling, 4 * pooling + 1, size=(t, batch)
            )[long_sel]
            capacity = int(lens.sum(axis=1).max())
            capacity = -(-capacity // 8) * 8
            offsets_np = np.zeros((t, batch + 1), np.int32)
            np.cumsum(lens, axis=1, out=offsets_np[:, 1:])
            log(f"ragged CSR: capacity={capacity} "
                f"mean_len={lens.mean():.2f} max_len={lens.max()}")
        else:
            # the reference wire at the same workload: fixed-L bags
            offsets_np = np.tile(
                np.arange(batch + 1, dtype=np.int32) * pooling,
                (t, 1),
            )
    idx_np = np.stack(
        [rng.integers(0, tb.num_rows, size=capacity) for tb in tables]
    ).astype(np.int32)
    idx = jnp.asarray(idx_np)
    mask = jnp.ones((t, capacity), dtype=bool)

    if wire == "csr":
        # the reference's native indices+offsets wire shape (emb_host.h:234):
        # the engine sees the generic ragged path (segment ids + segment
        # reduce)
        offsets = jnp.asarray(offsets_np)

        def lookup_fn(p, i, m):  # noqa: F811 — wire override
            del m
            return coll.lookup_csr(p, i, offsets)
    elif wire == "csr-bucketed":
        # host-side length bucketing (ops/ragged.py): same CSR workload,
        # re-wired into fixed-L dense dispatches + residual CSR tail.
        # The pack happens ON THE HOST before the loop (the reference also
        # builds its padded wire host-side, emb_host.h:30,262); the timed
        # loop rotates the packed id arrays in-graph like every other wire.
        import dataclasses as _dc

        from pim_embedding_lookup_tpu.ops.ragged import (
            pack_length_buckets, plan_length_buckets,
        )
        from pim_embedding_lookup_tpu.parallel import lookup_csr_bucketed

        bls = (pooling,) if not csr_ragged else tuple(
            sorted({1, pooling, 2 * pooling})
        )
        plan0 = plan_length_buckets(offsets_np, bucket_ls=bls, slack=1.0)
        # pack from host numpy (converting the device idx would queue a
        # D2H behind the in-flight init compile and pollute the timing)
        from pim_embedding_lookup_tpu.utils import native as _native

        packer = "native" if _native.available() else "numpy"
        pack_length_buckets(idx_np, offsets_np, plan0)  # warm (lib load)
        t_pack0 = time.perf_counter()
        packed0 = pack_length_buckets(idx_np, offsets_np, plan0)
        pack_ms = (time.perf_counter() - t_pack0) * 1e3
        log(f"bucket plan: ls={plan0.bucket_ls} caps={plan0.capacities} "
            f"tail_bags={plan0.tail_bags} tail_entries={plan0.tail_entries} "
            f"host_pack={pack_ms:.1f}ms/batch ({packer} packer)")
        # only the ROTATING id arrays become device arrays (jit args);
        # masks/pos/tail metadata stay host numpy so they embed as IR
        # constants at trace time — a closed-over DEVICE array costs a
        # D2H fetch through the tunnel per compile (observed as a
        # transient ABORTED during one compile) for the same bytes
        static = _dc.replace(
            packed0,
            idx=tuple(jnp.asarray(m) for m in packed0.idx),
            tail_idx=None if packed0.tail_idx is None
            else jnp.asarray(packed0.tail_idx),
        )
        # the rotating query pytree: bucket ids (+ tail ids if present)
        idx = (static.idx if static.tail_idx is None
               else static.idx + (static.tail_idx,))

        def lookup_fn(p, i, m):  # noqa: F811 — wire override
            del m
            if static.tail_idx is None:
                pk = _dc.replace(static, idx=i)
            else:
                pk = _dc.replace(static, idx=i[:-1], tail_idx=i[-1])
            return lookup_csr_bucketed(coll, p, pk)
    rows_arr = jnp.asarray([tb.num_rows for tb in tables], dtype=jnp.int32)
    # large co-prime-ish per-iteration stride: decorrelates access patterns
    stride = jnp.asarray(
        [max(1, tb.num_rows // 7 + 1) for tb in tables], dtype=jnp.int32
    )

    @jax.jit
    def timed_loop(params, idx, mask, n):
        # n is traced -> one compile serves warmup and the timed run
        def body(i, carry):
            acc, idx_i = carry
            out = lookup_fn(params, idx_i, mask)
            # rotate every table's ids within its range for the next iter
            # (idx may be a pytree of [T, *] id arrays — csr-bucketed wire)
            idx_next = jax.tree.map(
                lambda a: (a + stride[:, None]) % rows_arr[:, None], idx_i
            )
            # full-output consumption so no part of the lookup can be DCE'd
            return acc + jnp.sum(out), idx_next

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), idx))
        return acc

    log("params ready; compiling timed loop")
    # warmup/compile — timed and reported (VERDICT r4 weak #1: compile time
    # grew 12s -> 617s across rounds for the same config; track it so the
    # growth is visible in every BENCH_rN artifact)
    tc0 = time.perf_counter()
    jax.block_until_ready(timed_loop(params, idx, mask, 2))
    compile_s = time.perf_counter() - tc0
    log(f"compiled in {compile_s:.1f}s; timing")
    t0 = time.perf_counter()
    jax.block_until_ready(timed_loop(params, idx, mask, iters))
    dt = (time.perf_counter() - t0) / iters

    lookups_per_s = batch * t / dt
    dim = tables[0].dim
    # PHYSICAL bytes at the storage dtype (gather-model estimate: per entry
    # one dim-wide row at storage width, +4B per-row scale for int8 "row"
    # scale mode; f32 pooled output).  The MXU small set in hybrid mode
    # moves table*batch matmul bytes instead — this figure is the
    # gather-engine bound, not a hybrid-exact count; it is labeled
    # gather_model wherever it is published (ADVICE r4).
    itemsize = {"int8": 1, "bfloat16": 2, "float32": 4}[
        "int8" if quantized else dtype
    ]
    entry_bytes = dim * itemsize + (
        4 if (quantized and int8_scale == "row") else 0
    )
    bytes_moved = batch * t * pooling * entry_bytes + batch * t * dim * 4
    gbps = bytes_moved / dt / 1e9
    log(f"tpu: {dt*1e6:.1f} us/iter, {lookups_per_s/1e6:.2f}M lookups/s, "
        f"{gbps:.1f} GB/s pooled (storage-dtype gather model)")
    return lookups_per_s, gbps, dt, compile_s


def cpu_torch_rate(tables, batch, pooling, iters, seed=0):
    """Host-CPU torch EmbeddingBag — the engine the reference's DPU path
    replaces (dlrm_dpu_pytorch's apply_emb fallback, SURVEY.md §3.3)."""
    try:
        import torch
    except ImportError:
        return None
    torch.manual_seed(seed)
    # Tables must be MATERIALIZED (pages faulted, non-zero): torch.empty
    # returns untouched mmap pages that all alias the kernel zero page, so
    # gathers hit cache instead of DRAM and the baseline randomly ran
    # 1.65x too fast (measured 1.7ms vs 2.3-3.0ms run-to-run at r2/r3).
    # Real trained weights live in distinct DRAM pages; tile a small
    # random block to fault every page without a minutes-long full RNG.
    prng = np.random.default_rng(seed)
    block = prng.standard_normal((65536, tables[0].dim)).astype(np.float32)

    def make_table(nr, dim):
        blk = (block if dim == block.shape[1]
               else prng.standard_normal((65536, dim)).astype(np.float32))
        arr = np.empty((nr, dim), np.float32)
        for r0 in range(0, nr, blk.shape[0]):
            n = min(blk.shape[0], nr - r0)
            arr[r0 : r0 + n] = blk[:n]
        return torch.from_numpy(arr)

    bags = [
        torch.nn.EmbeddingBag.from_pretrained(
            make_table(tb.num_rows, tb.dim), mode="sum", freeze=True,
        )
        for tb in tables
    ]
    rng = np.random.default_rng(seed)
    idx = [
        torch.from_numpy(
            rng.integers(0, tb.num_rows, size=(batch, pooling)).astype(np.int64)
        )
        for tb in tables
    ]
    # median of 3 repeats: single-sample torch means swing 1.8-3.0ms on
    # this host (scheduling/frequency), which alone moves vs_baseline
    # 1.3x-2.1x — median is the fair, stable estimator
    reps = []
    with torch.no_grad():
        for b, i in zip(bags, idx):  # warmup
            b(i)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                for b, i in zip(bags, idx):
                    b(i)
            reps.append((time.perf_counter() - t0) / iters)
    dt = sorted(reps)[1]
    rate = batch * len(tables) / dt
    log(f"cpu torch: {dt*1e6:.1f} us/iter (median of {[f'{r*1e6:.0f}' for r in reps]}), "
        f"{rate/1e6:.3f}M lookups/s")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="kaggle",
                    choices=["kaggle", "random", "toy", "bigtable"])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--pooling", type=int, default=0,
                    help="indices per bag (default: 1 for kaggle single-hot, "
                         "32 for bigtable, 120 for random per r.sh)")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--cpu-iters", type=int, default=10)
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--no-hybrid", action="store_true",
                    help="disable the MXU small-table path")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16", "int8"],
                    help="table storage dtype (accumulation is always f32); "
                         "int8 = capacity mode (hybrid: MXU small set + "
                         "int8 big set)")
    ap.add_argument("--no-packed", action="store_true",
                    help="disable lane-packed storage for dim<128 tables")
    ap.add_argument("--mxu-threshold", type=int, default=0,
                    help="override the hybrid small-table row threshold "
                         "(0 = library default)")
    ap.add_argument("--wire", default="dense",
                    choices=["dense", "csr", "csr-bucketed"],
                    help="query wire shape: dense padded [T,B*L], the "
                         "reference's CSR indices+offsets (emb_host.h:234), "
                         "or CSR re-wired through host-side length "
                         "bucketing (ops/ragged.py)")
    ap.add_argument("--csr-ragged", action="store_true",
                    help="with a csr wire: genuinely ragged bag lengths "
                         "(mixture incl. empties and 4x-pooling outliers) "
                         "instead of fixed-L offsets")
    ap.add_argument("--int8-scale", default="table",
                    choices=["table", "row"],
                    help="int8 scale granularity: per-table (folded in "
                         "post-pool, one gather issue/entry — fast) or "
                         "per-row (scale rides the gather, 2x issues)")
    ap.add_argument("--tables-filter", default="",
                    choices=["", "small", "big"],
                    help="bench only the tables below/above the MXU "
                         "threshold (cost-split diagnostic)")
    args = ap.parse_args()

    from pim_embedding_lookup_tpu.config import (
        TableConfig,
        kaggle_config,
        random_config,
        toy_config,
    )

    if args.config == "bigtable":
        # BASELINE.json synthetic big-table config scaled to one chip's HBM:
        # 8 x 2M rows x dim 128 (8.2GB), pooling 32
        tables = tuple(
            TableConfig(num_rows=2_000_000, dim=128, name=f"big_{i}")
            for i in range(8)
        )
    else:
        cfg = {"kaggle": kaggle_config, "random": random_config, "toy": toy_config}[
            args.config
        ]()
        tables = cfg.tables
    if not args.pooling:
        args.pooling = {"kaggle": 1, "toy": 1, "random": 120, "bigtable": 32}[
            args.config
        ]
    if args.tables_filter:
        thr = args.mxu_threshold or 8192
        keep = ((lambda n: n <= thr) if args.tables_filter == "small"
                else (lambda n: n > thr))
        tables = tuple(tb for tb in tables if keep(tb.num_rows))
        log(f"tables-filter={args.tables_filter}: {len(tables)} tables")

    lookups_per_s, gbps, dt, compile_s = tpu_lookup_rate(
        tables, args.batch, args.pooling, args.iters,
        hybrid=not args.no_hybrid, dtype=args.dtype,
        packed=False if args.no_packed else "auto",
        mxu_threshold=args.mxu_threshold, wire=args.wire,
        int8_scale=args.int8_scale, csr_ragged=args.csr_ragged,
    )

    vs_baseline = None
    if not args.no_baseline:
        cpu_rate = cpu_torch_rate(tables, args.batch, args.pooling, args.cpu_iters)
        if cpu_rate:
            vs_baseline = lookups_per_s / cpu_rate

    print(
        json.dumps(
            {
                "metric": f"criteo_{args.config}_pooled_lookups_per_s_per_chip",
                "value": round(lookups_per_s, 1),
                "unit": "lookups/s",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
                "tpu_us_per_iter": round(dt * 1e6, 1),
                "compile_s": round(compile_s, 1),
                "gbps_gather_model": round(gbps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
