"""Worker for the true multi-process (N-host analog) tests.

Launched by tests/test_multiprocess.py as one OS process per simulated
host: each process owns 4 virtual CPU devices, joins a jax.distributed
cluster over a localhost coordinator (gloo collectives — the CPU stand-in
for DCN), builds the global (data=nproc, model=4) mesh, and checks lookup
+ sparse-update parity against a host numpy oracle on its ADDRESSABLE
shards only (no process ever sees the full global arrays — the point of
the N-host path, SURVEY.md §2c / multihost.py).

Usage: python tests/_mp_worker.py <pid> <nproc> <port> <policy>
Exits 0 on success; any assert failure exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    pid, nproc, port, policy_name = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pim_embedding_lookup_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import ShardingPolicy, TableConfig
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection
    from pim_embedding_lookup_tpu.parallel.sparse_update import (
        init_accumulator,
        sparse_update,
    )

    policy = ShardingPolicy(policy_name)
    mesh = multihost.make_pod_mesh(data=nproc, model=4)

    tables = (
        TableConfig(num_rows=96, dim=16, name="a"),
        TableConfig(num_rows=40, dim=16, name="b"),
        TableConfig(num_rows=256, dim=16, name="c"),
    )
    coll = EmbeddingCollection.create(tables, mesh, policy)

    rng = np.random.default_rng(7)  # same seed in every process
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = multihost.device_put_tables(coll, tables_np)

    t, b, l = len(tables), 8, 3
    idx_host = np.stack(
        [rng.integers(0, tb.num_rows, size=b * l) for tb in tables]
    ).astype(np.int32)
    mask_host = rng.random((t, b * l)) < 0.8

    # numpy oracle (full batch; every process knows it via the shared seed)
    oracle = np.zeros((b, t, 16), np.float32)
    for k in range(t):
        for e in range(b * l):
            if mask_host[k, e]:
                oracle[e // l, k] += tables_np[k][idx_host[k, e]]

    chunk = (b * l) // nproc
    lo, hi = pid * chunk, (pid + 1) * chunk
    idx, mask = multihost.make_global_queries(
        mesh, idx_host[:, lo:hi], mask_host[:, lo:hi]
    )
    out = coll.lookup(fused, idx, mask, batch_size=b)
    out.block_until_ready()
    for shard in out.addressable_shards:
        expect = oracle[shard.index]
        np.testing.assert_allclose(
            np.asarray(shard.data), expect, rtol=1e-5, atol=1e-5,
            err_msg=f"lookup shard {shard.index} (proc {pid})",
        )

    # sparse SGD update parity: scatter-apply on device, replay on host
    lr = 0.05
    g_host = rng.standard_normal((b, t, 16)).astype(np.float32)
    gsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    g = jax.make_array_from_process_local_data(gsh, g_host[lo // l : hi // l])
    acc = init_accumulator(coll)
    fused2, _ = sparse_update(
        coll, fused, acc, idx, mask, g, lr=lr, optimizer="sgd"
    )
    fused2.block_until_ready()

    expect_tables = [arr.copy() for arr in tables_np]
    for k in range(t):
        for e in range(b * l):
            if mask_host[k, e]:
                expect_tables[k][idx_host[k, e]] -= lr * g_host[e // l, k]
    expect_fused = coll.fused_host_array(expect_tables)
    for shard in fused2.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), expect_fused[shard.index],
            rtol=1e-5, atol=1e-5,
            err_msg=f"update shard {shard.index} (proc {pid})",
        )
    # routed (all-to-all) lookup + update across processes — the collectives
    # that ride ICI/DCN on a real pod (SURVEY.md §2c)
    if policy in (ShardingPolicy.ROW, ShardingPolicy.ROW_HASH):
        # API-default capacity factor: drops must be impossible even under
        # contiguous ROW ownership skew (the round-1 red test)
        out_r, dropped = coll.lookup_routed(
            fused, idx, mask, batch_size=b, return_stats=True
        )
        out_r.block_until_ready()
        assert int(jax.device_get(dropped)) == 0, "routed lookup dropped entries"
        for shard in out_r.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(shard.data), oracle[shard.index],
                rtol=1e-5, atol=1e-5,
                err_msg=f"routed lookup shard {shard.index} (proc {pid})",
            )
        acc_r = init_accumulator(coll)
        fused_r, _, upd_drops = sparse_update(
            coll, fused, acc_r, idx, mask, g, lr=lr, optimizer="sgd",
            routed=True, return_stats=True,
        )
        fused_r.block_until_ready()
        assert int(jax.device_get(upd_drops)) == 0, "routed update dropped entries"
        for shard in fused_r.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(shard.data), expect_fused[shard.index],
                rtol=1e-5, atol=1e-5,
                err_msg=f"routed update shard {shard.index} (proc {pid})",
            )

    print(f"proc {pid} policy={policy_name}: OK", flush=True)


if __name__ == "__main__":
    main()
