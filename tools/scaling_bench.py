"""Scaling-efficiency harness: lookups/s at 1 -> N shards on one mesh.

BASELINE.json north star: ">=80% lookups/s scaling efficiency 1 -> N hosts".
On real multi-chip hardware this measures true ICI/DCN scaling; on a single
host it can run against the virtual CPU mesh (--force-cpu N) to validate
the mechanics and the collective structure (the reference has no multi-node
anything to compare against — SURVEY.md §2c).

    python tools/scaling_bench.py                 # real devices
    python tools/scaling_bench.py --force-cpu 8   # 8 virtual CPU devices
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def rate_at(num_shards, tables, batch, pooling, iters, policy_name):
    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh

    mesh = make_mesh(MeshConfig(data=1, model=num_shards))
    coll = EmbeddingCollection.create(
        tables, mesh, ShardingPolicy(policy_name)
    )
    fused = coll.init(jax.random.PRNGKey(0))
    jax.block_until_ready(fused)
    rng = np.random.default_rng(0)
    t = len(tables)
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, tb.num_rows, size=batch * pooling) for tb in tables]
        ).astype(np.int32)
    )
    mask = jnp.ones((t, batch * pooling), bool)
    f = jax.jit(lambda fu, i, m: coll.lookup(fu, i, m, batch_size=batch))
    out = f(fused, idx, mask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(fused, idx, mask)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return batch * t / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-cpu", type=int, default=0,
                    help="use N virtual CPU devices instead of real chips")
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pooling", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--policy", default="row")
    args = ap.parse_args()

    import os

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from pim_embedding_lookup_tpu.config import TableConfig

    tables = tuple(
        TableConfig(num_rows=args.rows, dim=args.dim, name=f"t{i}")
        for i in range(args.tables)
    )
    n = jax.device_count()
    shard_counts = [s for s in [1, 2, 4, 8, 16, 32] if s <= n]
    results = {}
    for s in shard_counts:
        results[s] = rate_at(
            s, tables, args.batch, args.pooling, args.iters, args.policy
        )
        print(f"shards={s}: {results[s]/1e6:.2f}M lookups/s", file=sys.stderr)
    base = results[shard_counts[0]]
    report = {
        "policy": args.policy,
        "lookups_per_s": {str(k): round(v, 1) for k, v in results.items()},
        "scaling_efficiency": {
            str(k): round(v / (base * k), 3) for k, v in results.items()
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
