"""Worker for the true multi-process (N-host analog) tests.

Launched by tests/test_multiprocess.py as one OS process per simulated
host: each process owns 4 virtual CPU devices, joins a jax.distributed
cluster over a localhost coordinator (gloo collectives — the CPU stand-in
for DCN), builds the global (data=nproc, model=4) mesh, and checks lookup
+ sparse-update parity against a host numpy oracle on its ADDRESSABLE
shards only (no process ever sees the full global arrays — the point of
the N-host path, SURVEY.md §2c / multihost.py).

Usage: python tests/_mp_worker.py <pid> <nproc> <port> <policy> [local_devices]
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
    local = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pim_embedding_lookup_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == local * nproc

    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import ShardingPolicy, TableConfig
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection
    from pim_embedding_lookup_tpu.parallel.sparse_update import (
        init_accumulator,
        sparse_update,
    )

    policy = ShardingPolicy(policy_name)
    mesh = multihost.make_pod_mesh(data=nproc, model=local)
    # the placement rule make_pod_mesh promises (the reference's
    # within-rank analog, emb_types.h:6-7): every model-axis row lives in
    # ONE process, so psum-heavy table collectives ride ICI while only the
    # data axis crosses hosts/DCN
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            f"model axis spans processes: {[d.process_index for d in row]}"
        )

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

    # r4 flagship-composition coverage (VERDICT r3 item 7), ROW_HASH only
    # to bound the gloo suite's wall clock:
    #   (a) data-sharded CSR lookup (broadcast + routed) across processes
    #   (b) hybrid (MXU small set + packed big set) ROUTED train step parity
    if policy == ShardingPolicy.ROW_HASH:
        _csr_across_processes(mesh, coll, fused, tables, tables_np, pid, nproc)
        _hybrid_routed_train_parity(mesh, pid, nproc)

    print(f"proc {pid} policy={policy_name}: OK", flush=True)


def _csr_across_processes(mesh, coll, fused, tables, tables_np, pid, nproc):
    """Data-sharded CSR wire form on the true multi-process mesh: each
    process contributes its own per-shard entry window (window-local
    offsets), output bags land batch-sharded; routed variant exercises the
    capacity-bucketed all_to_alls across the pod mesh."""
    import jax
    import numpy as np

    from pim_embedding_lookup_tpu.ops.ragged import shard_csr
    from pim_embedding_lookup_tpu.parallel import multihost

    rng = np.random.default_rng(11)  # same seed in every process
    t, b = len(tables), 8
    bags = [
        [
            rng.integers(0, tb.num_rows, size=rng.integers(0, 5))
            .astype(int).tolist()
            for _ in range(b)
        ]
        for tb in tables
    ]
    cap = b * 5 // nproc
    idx_host, off_host = shard_csr(bags, nproc, capacity_per_shard=cap)

    oracle = np.zeros((b, t, 16), np.float32)
    for k in range(t):
        for bi, bag in enumerate(bags[k]):
            for r in bag:
                oracle[bi, k] += tables_np[k][r]

    bd = b // nproc
    lo_i, hi_i = pid * cap, (pid + 1) * cap
    lo_o, hi_o = pid * (bd + 1), (pid + 1) * (bd + 1)
    idx, off = multihost.make_global_queries(
        mesh, idx_host[:, lo_i:hi_i], off_host[:, lo_o:hi_o]
    )
    out = coll.lookup_csr(fused, idx, off, data_sharded=True)
    out.block_until_ready()
    for shard in out.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), oracle[shard.index], rtol=1e-5, atol=1e-5,
            err_msg=f"data-sharded CSR shard {shard.index} (proc {pid})",
        )

    out_r, dropped = coll.lookup_csr(
        fused, idx, off, data_sharded=True, routed=True, return_stats=True
    )
    out_r.block_until_ready()
    assert int(jax.device_get(dropped)) == 0, "routed CSR dropped entries"
    for shard in out_r.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), oracle[shard.index], rtol=1e-5, atol=1e-5,
            err_msg=f"routed CSR shard {shard.index} (proc {pid})",
        )


def _hybrid_routed_train_parity(mesh, pid, nproc):
    """One full hybrid sparse train step, routed vs broadcast, on identical
    inputs across the true 2-process mesh: losses match and every
    addressable big-set shard matches — the flagship multi-chip
    composition's collectives (all_to_all routing + psum merges + DP grad
    all-reduce) agree with the broadcast path's."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pim_embedding_lookup_tpu.config import DLRMConfig, ShardingPolicy, TableConfig
    from pim_embedding_lookup_tpu.models import DLRM
    from pim_embedding_lookup_tpu.models.sparse_train import (
        make_sparse_train_state,
        make_sparse_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = DLRMConfig(
        dense_dim=4,
        mlp_bot=(8, 16),
        mlp_top=(8, 1),
        tables=(
            TableConfig(num_rows=48, dim=16, name="s"),    # MXU small set
            TableConfig(num_rows=16384, dim=16, name="b"),  # packed big set
        ),
    )
    model = DLRM(cfg, mesh, ShardingPolicy.ROW_HASH, hybrid=True)

    rng = np.random.default_rng(23)  # same seed in every process
    t, l = 2, 2
    b = 8 * nproc  # global batch, DP-sharded over processes
    dense_h = rng.standard_normal((b, 4)).astype(np.float32)
    idx_h = np.stack(
        [rng.integers(0, tb.num_rows, size=b * l) for tb in cfg.tables]
    ).astype(np.int32)
    mask_h = np.ones((t, b * l), bool)
    labels_h = (rng.random(b) < 0.5).astype(np.float32)

    bd, cd = b // nproc, (b * l) // nproc
    d_sh = NamedSharding(mesh, P("data"))
    dense = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), dense_h[pid * bd:(pid + 1) * bd]
    )
    labels = jax.make_array_from_process_local_data(
        d_sh, labels_h[pid * bd:(pid + 1) * bd]
    )
    q_sh = NamedSharding(mesh, P(None, "data"))
    idx = jax.make_array_from_process_local_data(
        q_sh, idx_h[:, pid * cd:(pid + 1) * cd]
    )
    mask = jax.make_array_from_process_local_data(
        q_sh, mask_h[:, pid * cd:(pid + 1) * cd]
    )

    outs = {}
    for routed in (False, True):
        # the train step DONATES emb/acc buffers — rebuild state per
        # variant (init is key-deterministic, so both start identical)
        params = model.init(jax.random.PRNGKey(0))
        dense_opt, opt_state, acc = make_sparse_train_state(
            model, params, lr=0.2
        )
        dense_params = {k: params[k] for k in ("bot", "top")}
        step = make_sparse_train_step(
            model, dense_opt, lr=0.2, optimizer="row_adagrad", routed=routed
        )
        emb, acc_o, dp, os_, loss = step(
            params["emb"], acc, dense_params, opt_state,
            dense, idx, mask, labels,
        )
        jax.block_until_ready(loss)
        outs[routed] = (emb, float(jax.device_get(loss)))

    assert abs(outs[True][1] - outs[False][1]) < 1e-5, (
        f"routed/broadcast loss mismatch: {outs[True][1]} vs {outs[False][1]}"
    )
    big_r, big_b = outs[True][0]["big"], outs[False][0]["big"]
    for sr, sb in zip(big_r.addressable_shards, big_b.addressable_shards):
        np.testing.assert_allclose(
            np.asarray(sr.data), np.asarray(sb.data), rtol=1e-5, atol=1e-6,
            err_msg=f"hybrid routed big-set shard {sr.index} (proc {pid})",
        )


if __name__ == "__main__":
    main()
