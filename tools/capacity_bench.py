"""Capacity bench: int8 sharded collection at table sizes f32 cannot hold.

4 tables x 25M rows x dim 64 = 6.4GB int8 (+0.4GB scales) on one 16GB
chip; the f32 equivalent is 25.6GB.  The analog of the reference's
MRAM-capacity envelope (14MB/DPU slice, emb_types.h:5, and r.sh's
13.9M-row sweep ceiling).  In-graph timing (see kernel_lab.py).

    python tools/capacity_bench.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=4)
    ap.add_argument("--rows", type=int, default=25_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--scale-mode", default="table", choices=["table", "row"],
                    help="int8 scale granularity: per-table (post-pool fold, "
                         "one gather issue/entry) or per-row (2x issues)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, TableConfig,
    )
    from pim_embedding_lookup_tpu.parallel import (
        QuantizedEmbeddingCollection, make_mesh,
    )

    tables = tuple(
        TableConfig(num_rows=args.rows, dim=args.dim, name=f"cap_{i}")
        for i in range(args.tables)
    )
    scale_bytes = 4 if args.scale_mode == "row" else 0
    gb_int8 = sum(t.num_rows * (t.dim + scale_bytes) for t in tables) / 1e9
    gb_f32 = sum(t.num_rows * t.dim * 4 for t in tables) / 1e9
    print(f"int8 {gb_int8:.1f}GB (f32 would be {gb_f32:.1f}GB) "
          f"scale_mode={args.scale_mode}", file=sys.stderr)

    mesh = make_mesh(MeshConfig(data=1, model=jax.device_count()))
    policy = (
        ShardingPolicy.REPLICATE
        if jax.device_count() == 1
        else ShardingPolicy.ROW_HASH
    )
    coll = QuantizedEmbeddingCollection.create(
        tables, mesh, policy, scale_mode=args.scale_mode
    )
    params = coll.init(jax.random.PRNGKey(0))
    jax.block_until_ready(params["q"])
    print(f"params ready pack={coll.layout.pack}", file=sys.stderr)

    rng = np.random.default_rng(0)
    t, b, l = len(tables), args.batch, args.pooling
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, tb.num_rows, size=b * l) for tb in tables]
        ).astype(np.int32)
    )
    mask = jnp.ones((t, b * l), bool)
    rows_arr = jnp.asarray([tb.num_rows for tb in tables], dtype=jnp.int32)
    stride = jnp.asarray(
        [max(1, tb.num_rows // 7 + 1) for tb in tables], dtype=jnp.int32
    )

    @jax.jit
    def loop(params, idx, n):
        def body(i, carry):
            acc, idx_i = carry
            out = coll.lookup(params, idx_i, mask, batch_size=b)
            return acc + jnp.sum(out), (idx_i + stride[:, None]) % rows_arr[:, None]

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), idx))
        return acc

    jax.block_until_ready(loop(params, idx, 2))
    print("compiled; timing", file=sys.stderr)
    t0 = time.perf_counter()
    jax.block_until_ready(loop(params, idx, args.iters))
    dt = (time.perf_counter() - t0) / args.iters

    # FULL query surface at capacity (VERDICT r3 item 2): the same int8
    # storage serves the CSR wire shape and the MEAN combiner through the
    # shared dispatches — timed here so the capacity point isn't a
    # single-method citizen.  (The routed variant needs model>1; it is
    # parity-tested on the 8-device CPU mesh, tests/test_quantized_
    # collection.py::test_quantized_routed_parity.)
    offsets = jnp.asarray(
        np.tile(np.arange(b + 1, dtype=np.int32) * l, (t, 1))
    )

    @jax.jit
    def loop_csr(params, idx, n):
        def body(i, carry):
            acc, idx_i = carry
            out = coll.lookup_csr(params, idx_i, offsets)
            return acc + jnp.sum(out), (idx_i + stride[:, None]) % rows_arr[:, None]

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), idx))
        return acc

    jax.block_until_ready(loop_csr(params, idx, 2))
    t0 = time.perf_counter()
    jax.block_until_ready(loop_csr(params, idx, args.iters))
    dt_csr = (time.perf_counter() - t0) / args.iters

    @jax.jit
    def loop_mean(params, idx, n):
        def body(i, carry):
            acc, idx_i = carry
            out = coll.lookup(params, idx_i, mask, batch_size=b,
                              combiner="mean")
            return acc + jnp.sum(out), (idx_i + stride[:, None]) % rows_arr[:, None]

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), idx))
        return acc

    jax.block_until_ready(loop_mean(params, idx, 2))
    t0 = time.perf_counter()
    jax.block_until_ready(loop_mean(params, idx, args.iters))
    dt_mean = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "int8_capacity_pooled_lookups_per_s",
        "scale_mode": args.scale_mode,
        "tables_gb_int8": round(gb_int8, 2),
        "tables_gb_f32_equiv": round(gb_f32, 2),
        "us_per_iter": round(dt * 1e6, 1),
        "value": round(b * t / dt, 1),
        "unit": "lookups/s",
        "csr_us_per_iter": round(dt_csr * 1e6, 1),
        "csr_lookups_per_s": round(b * t / dt_csr, 1),
        "mean_us_per_iter": round(dt_mean * 1e6, 1),
        "mean_lookups_per_s": round(b * t / dt_mean, 1),
        "routed_note": "routed int8 needs model>1; parity-tested on the "
                       "8-device CPU mesh (test_quantized_routed_parity)",
    }))


if __name__ == "__main__":
    main()
