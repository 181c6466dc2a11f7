"""Scaling-efficiency harness: lookups/s at 1 -> N shards on one mesh.

BASELINE.json north star: ">=80% lookups/s scaling efficiency 1 -> N hosts".
Three axes (--axis):

* data   — DP batch scaling: mesh (data=s, model=1), global batch grows with
           s.  THE throughput axis: per-chip gather issues stay constant, so
           on real chips this is where lookups/s scales.
* routed — model-axis scaling WITH all-to-all id routing (lookup_routed,
           ROW_HASH): per-shard gather issues drop ~1/s — capacity AND
           throughput scale together.
* model  — model-axis scaling with the broadcast-and-mask lookup: every
           shard still issues all gathers; capacity scales, throughput does
           not (kept for comparison against `routed`).

On real multi-chip hardware this measures true ICI scaling; on a single
host use --force-cpu N for the virtual CPU mesh — that validates the
collective STRUCTURE, but virtual devices share one host's cores, so the
efficiency numbers are not meaningful there (the reference has no
multi-node anything to compare against — SURVEY.md §2c).

Timing is IN-GRAPH (lax.fori_loop + query rotation) — host-side loops are
untrustworthy in this environment (docs/PERF.md rule 1).

    python tools/scaling_bench.py --axis data            # real devices
    python tools/scaling_bench.py --force-cpu 8 --axis routed
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def rate_at(num_shards, axis, tables, batch, pooling, iters, policy_name,
            capacity_factor=2.0):
    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh

    if axis == "data":
        mesh = make_mesh(MeshConfig(data=num_shards, model=1))
        policy = ShardingPolicy.REPLICATE
        b = batch * num_shards  # global batch grows with the data axis
    else:
        mesh = make_mesh(MeshConfig(data=1, model=num_shards))
        policy = (
            ShardingPolicy.REPLICATE if num_shards == 1
            else ShardingPolicy(policy_name)
        )
        b = batch
    coll = EmbeddingCollection.create(tables, mesh, policy, packed="auto")
    fused = coll.init(jax.random.PRNGKey(0))
    jax.block_until_ready(fused)

    rng = np.random.default_rng(0)
    t = len(tables)
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, tb.num_rows, size=b * pooling) for tb in tables]
        ).astype(np.int32)
    )
    mask = jnp.ones((t, b * pooling), bool)
    rows_arr = jnp.asarray([tb.num_rows for tb in tables], dtype=jnp.int32)
    stride = jnp.asarray(
        [max(1, tb.num_rows // 7 + 1) for tb in tables], dtype=jnp.int32
    )
    routed = axis == "routed" and num_shards > 1
    drops = 0
    if routed:
        # throughput-mode cf (the whole point of this axis: per-shard gather
        # issues ~cf*E/M); verify the uniform stream really incurs no drops
        _, d = coll.lookup_routed(
            fused, idx, mask, batch_size=b,
            capacity_factor=capacity_factor, return_stats=True,
        )
        drops = int(jax.device_get(d))

    @jax.jit
    def loop(fused, idx, n):
        def body(i, carry):
            acc, idx_i = carry
            if routed:
                out = coll.lookup_routed(
                    fused, idx_i, mask, batch_size=b,
                    capacity_factor=capacity_factor,
                )
            else:
                out = coll.lookup(fused, idx_i, mask, batch_size=b)
            return acc + jnp.sum(out), (idx_i + stride[:, None]) % rows_arr[:, None]

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), idx))
        return acc

    jax.block_until_ready(loop(fused, idx, 2))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(fused, idx, iters))
    dt = (time.perf_counter() - t0) / iters
    return b * t / dt, drops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force-cpu", type=int, default=0,
                    help="use N virtual CPU devices instead of real chips")
    ap.add_argument("--axis", default="data",
                    choices=["data", "model", "routed"])
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--tables", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1024,
                    help="per-data-shard batch (data axis) or global batch")
    ap.add_argument("--pooling", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--policy", default="row_hash")
    ap.add_argument("--capacity-factor", type=float, default=2.0,
                    help="routed-axis bucket capacity (throughput mode; "
                         "drops are counted and reported)")
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
    results, drops = {}, {}
    for s in shard_counts:
        results[s], drops[s] = rate_at(
            s, args.axis, tables, args.batch, args.pooling, args.iters,
            args.policy, args.capacity_factor,
        )
        print(f"shards={s}: {results[s]/1e6:.2f}M lookups/s "
              f"(drops={drops[s]})", file=sys.stderr)

    base = results[shard_counts[0]]
    print(json.dumps({
        "axis": args.axis,
        "policy": args.policy,
        "capacity_factor": args.capacity_factor,
        "lookups_per_s": {str(s): round(r, 1) for s, r in results.items()},
        "routed_drops": {str(s): d for s, d in drops.items()},
        "scaling_efficiency": {
            str(s): round(r / (base * s), 3) for s, r in results.items()
        },
    }))


if __name__ == "__main__":
    main()
