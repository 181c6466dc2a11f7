"""Kernel lab: compare pooled-lookup implementations on real hardware.

Measures the Criteo-Kaggle headline shape (fused 33.7M x 16 table, batch
8192 x 26 single-hot lookups) across candidate strategies to pick the
production kernel.  Run on the TPU:  python tools/kernel_lab.py
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=33_762_584)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n, d = args.rows, args.dim
    c = args.batch * args.tables * args.pooling  # total gathered rows
    print(f"rows={n} dim={d} gathers/iter={c}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    table = jax.jit(
        lambda k: jax.random.uniform(k, (n, d), jnp.float32, -0.1, 0.1)
    )(key)
    jax.block_until_ready(table)

    rng = np.random.default_rng(0)
    flat_idx = jnp.asarray(rng.integers(0, n, size=c).astype(np.int32))
    # bytes actually requested per iter (useful rows only)
    useful_mb = c * d * 4 / 1e6

    results = {}

    def report(name, dt):
        rate = c / dt
        results[name] = dt
        print(
            f"{name:28s} {dt*1e6:9.1f} us  {rate/1e6:8.2f}M rows/s  "
            f"{useful_mb/dt/1e3:6.1f} GB/s useful",
            file=sys.stderr,
        )

    def want(name):
        return not args.only or args.only in name

    # 1. plain XLA take (the current production path's core)
    if want("take"):
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
        report("take[N,16]", timeit(f, table, flat_idx, iters=args.iters))

    # 2. take with bags pooled (B,T,L form like collection lookup)
    if want("dense_pool"):
        idx3 = flat_idx.reshape(args.tables, args.batch, args.pooling)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=2))
        report("take[T,B,L]+pool", timeit(f, table, idx3, iters=args.iters))

    # 3. packed rows: [N/8, 128] gather + lane-group select
    if want("packed"):
        pack = 128 // d
        npacked = -(-n // pack)
        table_p = jnp.pad(table, ((0, npacked * pack - n), (0, 0))).reshape(
            npacked, pack * d
        )

        @jax.jit
        def packed_gather(tp, i):
            rows = jnp.take(tp, i // pack, axis=0)  # [C, 128]
            sel = jax.nn.one_hot(i % pack, pack, dtype=tp.dtype)  # [C, pack]
            picked = jnp.einsum(
                "cg,cgd->cd", sel, rows.reshape(-1, pack, d)
            )
            return picked.sum(axis=0)

        report("packed[N/8,128]", timeit(packed_gather, table_p, flat_idx, iters=args.iters))

    # 4. sorted gather (locality): sort ids, gather, unsort not needed for sum
    if want("sorted"):
        @jax.jit
        def sorted_gather(t, i):
            si = jnp.sort(i)
            return jnp.take(t, si, axis=0).sum(axis=0)

        report("sorted+take", timeit(sorted_gather, table, flat_idx, iters=args.iters))

    # 5. pallas row-DMA kernel (CSR, tile_b x nbuf variants)
    if want("pallas"):
        from pim_embedding_lookup_tpu.ops.pallas_lookup import pallas_embedding_bag_csr

        bsz = args.batch * args.tables  # bags
        offsets = jnp.arange(bsz + 1, dtype=jnp.int32) * args.pooling
        for tile_b, nbuf in [(8, 8), (8, 16), (16, 16), (8, 32)]:
            f = jax.jit(
                functools.partial(
                    pallas_embedding_bag_csr,
                    batch_size=bsz,
                    tile_b=tile_b,
                    nbuf=nbuf,
                )
            )
            try:
                dt = timeit(f, table, flat_idx, offsets, iters=args.iters)
                report(f"pallas tb={tile_b} nbuf={nbuf}", dt)
            except Exception as e:
                print(f"pallas tb={tile_b} nbuf={nbuf} FAILED: {type(e).__name__}: {e}",
                      file=sys.stderr)

    # 6. bf16 table
    if want("bf16"):
        tb = table.astype(jnp.bfloat16)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
        report("take bf16", timeit(f, tb, flat_idx, iters=args.iters))

    best = min(results, key=results.get)
    print(f"BEST: {best} {results[best]*1e6:.1f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
