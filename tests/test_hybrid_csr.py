"""Hybrid flagship query surface (r2): CSR bags, SUM/MEAN/MAX combiners,
data-sharded CSR, bucketed MXU layout, and routed lookup/update plumbing
(VERDICT r1 next-round items 4, 5, 9).

Reference parity: the wire format IS CSR (emb_host.h:234
``lookup(uint32_t **indices, uint32_t **offsets, ...)``); the reference
hardwires SUM (emb_dpu_lookup.c:114) — the combiner set matches
torch.nn.EmbeddingBag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh
from pim_embedding_lookup_tpu.parallel.hybrid import HybridEmbeddingCollection
from pim_embedding_lookup_tpu.parallel.sparse_update import init_accumulator
from pim_embedding_lookup_tpu.parallel.hybrid import (
    init_accumulator_hybrid,
    sparse_update_hybrid,
)
from pim_embedding_lookup_tpu.ops.ragged import shard_csr

TABLES = (
    TableConfig(num_rows=50, dim=16, name="tiny"),
    TableConfig(num_rows=40_000, dim=16, name="big1"),
    TableConfig(num_rows=300, dim=16, name="small"),
    TableConfig(num_rows=60_000, dim=16, name="big2"),
    TableConfig(num_rows=7, dim=16, name="micro"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def make_bags(rng, tables, b, max_len=6, empty_rate=0.2):
    """Ragged per-table bags with deliberate empty bags."""
    bags = []
    for t in tables:
        tb = []
        for _ in range(b):
            n = 0 if rng.random() < empty_rate else int(rng.integers(1, max_len))
            tb.append(list(rng.integers(0, t.num_rows, size=n)))
        bags.append(tb)
    return bags


def oracle_csr(tables_np, bags, combiner):
    b = len(bags[0])
    t = len(bags)
    out = np.zeros((b, t, tables_np[0].shape[1]), np.float32)
    for ti in range(t):
        for bi in range(b):
            ids = bags[ti][bi]
            if not ids:
                continue
            rows = tables_np[ti][ids]
            out[bi, ti] = {
                "sum": rows.sum(0), "mean": rows.mean(0), "max": rows.max(0)
            }[combiner]
    return out


@pytest.mark.parametrize("combiner", ["sum", "mean", "max"])
@pytest.mark.parametrize("data_sharded", [False, True])
def test_hybrid_csr_parity(mesh, rng, combiner, data_sharded):
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b = 16
    bags = make_bags(rng, TABLES, b)
    nd = mesh.shape["data"] if data_sharded else 1
    cap = 8 * (b // nd)  # fixed per-shard capacity
    idx, off = shard_csr(bags, nd, cap)
    out = coll.lookup_csr(
        params, jnp.asarray(idx), jnp.asarray(off),
        combiner=combiner, data_sharded=data_sharded,
    )
    expected = oracle_csr(tables_np, bags, combiner)
    # small set rides bf16 matmuls: weights round to bf16 (~0.4% rel)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("combiner", ["sum", "mean", "max"])
@pytest.mark.parametrize(
    "policy", [ShardingPolicy.ROW_HASH, ShardingPolicy.COLUMN]
)
def test_collection_csr_combiners(mesh, rng, combiner, policy):
    """Plain (non-hybrid) collection CSR parity with every combiner —
    exact (no bf16 path)."""
    tables = TABLES[:3]
    coll = EmbeddingCollection.create(tables, mesh, policy)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    b = 8
    bags = make_bags(rng, tables, b)
    idx, off = shard_csr(bags, 1, 8 * b)
    out = coll.lookup_csr(
        fused, jnp.asarray(idx), jnp.asarray(off), combiner=combiner
    )
    np.testing.assert_allclose(
        np.asarray(out), oracle_csr(tables_np, bags, combiner),
        rtol=1e-5, atol=1e-5,
    )


def test_collection_csr_data_sharded_parity(mesh, rng):
    """Per-shard CSR (fixed per-shard capacity) == replicated CSR, and the
    output is batch-sharded over the data axis like the dense form."""
    tables = TABLES[:3]
    coll = EmbeddingCollection.create(tables, mesh, ShardingPolicy.ROW_HASH)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    b = 16
    bags = make_bags(rng, tables, b)
    nd = mesh.shape["data"]
    idx, off = shard_csr(bags, nd, 8 * (b // nd))
    out = coll.lookup_csr(
        fused, jnp.asarray(idx), jnp.asarray(off), data_sharded=True
    )
    np.testing.assert_allclose(
        np.asarray(out), oracle_csr(tables_np, bags, "sum"),
        rtol=1e-5, atol=1e-5,
    )
    assert "data" in str(out.sharding.spec)


@pytest.mark.parametrize("combiner", ["mean", "max"])
def test_hybrid_dense_combiners(mesh, rng, combiner):
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b, l = 16, 3
    idx3 = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    mask3 = rng.random((5, b, l)) < 0.7
    out = coll.lookup(
        params,
        jnp.asarray(idx3.reshape(5, b * l)),
        jnp.asarray(mask3.reshape(5, b * l)),
        batch_size=b, combiner=combiner,
    )
    expected = np.zeros((b, 5, 16), np.float32)
    for ti in range(5):
        for bi in range(b):
            ids = [idx3[ti, bi, li] for li in range(l) if mask3[ti, bi, li]]
            if not ids:
                continue
            rows = tables_np[ti][ids]
            expected[bi, ti] = rows.mean(0) if combiner == "mean" else rows.max(0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-2, atol=1e-2)


def test_hybrid_routed_lookup_and_update(mesh, rng):
    """routed=True on the hybrid surface: big set lookup/update through the
    all-to-all paths, zero drops at the default cf, parity vs broadcast."""
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b, l = 16, 3
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.num_rows, size=b * l) for t in TABLES]
    ).astype(np.int32))
    mask = jnp.asarray(rng.random((5, b * l)) < 0.8)

    routed, dropped = coll.lookup(
        params, idx, mask, batch_size=b, routed=True, return_stats=True
    )
    assert int(dropped) == 0
    broadcast = coll.lookup(params, idx, mask, batch_size=b)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(broadcast), rtol=1e-5, atol=1e-5
    )

    g = jnp.asarray(rng.standard_normal((b, 5, 16)).astype(np.float32))
    accs = init_accumulator_hybrid(coll)
    p_r, _, upd_drops = sparse_update_hybrid(
        coll, params, accs, idx, mask, g, lr=0.1, optimizer="row_adagrad",
        routed=True, return_stats=True,
    )
    assert int(upd_drops) == 0
    params2 = coll.device_put_tables(tables_np)
    p_b, _ = sparse_update_hybrid(
        coll, params2, init_accumulator_hybrid(coll), idx, mask, g,
        lr=0.1, optimizer="row_adagrad",
    )
    np.testing.assert_allclose(
        np.asarray(p_r["big"]), np.asarray(p_b["big"]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("data_sharded", [False, True])
def test_hybrid_routed_csr_passthrough(mesh, rng, data_sharded):
    """lookup_csr(routed=True) on the hybrid surface (VERDICT r3 item 1):
    big set rides the routed CSR all-to-all, small set stays MXU; zero
    drops at the default cf, parity vs the broadcast hybrid CSR path."""
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b = 16
    bags = make_bags(rng, TABLES, b)
    nd = mesh.shape["data"] if data_sharded else 1
    idx, off = shard_csr(bags, nd, 8 * (b // nd))
    idx, off = jnp.asarray(idx), jnp.asarray(off)

    got, dropped = coll.lookup_csr(
        params, idx, off, data_sharded=data_sharded, routed=True,
        return_stats=True,
    )
    assert int(dropped) == 0
    want = coll.lookup_csr(params, idx, off, data_sharded=data_sharded)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_bucket_plan_invariants(mesh):
    """Bucketed small layout: pow2 padding, contiguous groups, one einsum
    per distinct bucket size (compile cost stops scaling with T)."""
    many = tuple(
        TableConfig(num_rows=n, dim=16, name=f"t{i}")
        for i, n in enumerate([3, 5, 9, 17, 33, 65, 129, 257, 513, 700, 900])
    )
    coll = HybridEmbeddingCollection.create(
        many, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=8192
    )
    lay = coll.small.layout
    sizes = {b[1] for b in coll.buckets}
    assert len(coll.buckets) == len(sizes)  # one bucket per distinct size
    assert len(coll.buckets) <= 8
    # members cover all tables exactly once, offsets padded to the bucket
    covered = []
    for start, npad, lo, hi in coll.buckets:
        assert npad == max(8, 1 << (npad - 1).bit_length())
        for j in range(lo, hi):
            assert lay.row_offsets[j] == start + (j - lo) * npad
            assert lay.table_rows[j] <= npad
        covered.extend(range(lo, hi))
    assert sorted(covered) == list(range(len(many)))
    assert lay.total_rows == sum(b[1] * (b[3] - b[2]) for b in coll.buckets)


def test_routed_train_step_learns(mesh):
    """End-to-end: the routed hybrid sparse train step trains (the
    composition __graft_entry__.dryrun_multichip validates for the driver)."""
    from pim_embedding_lookup_tpu.config import DLRMConfig
    from pim_embedding_lookup_tpu.models import DLRM
    from pim_embedding_lookup_tpu.models.sparse_train import (
        make_sparse_train_state,
        make_sparse_train_step,
    )

    cfg = DLRMConfig(
        dense_dim=4,
        mlp_bot=(16, 16),
        mlp_top=(8, 1),
        tables=(
            TableConfig(num_rows=40, dim=16, name="s"),
            TableConfig(num_rows=5000, dim=16, name="b"),
        ),
    )
    model = DLRM(cfg, mesh, ShardingPolicy.ROW_HASH, hybrid=True)
    params = model.init(jax.random.PRNGKey(0))
    dense_opt, opt_state, acc = make_sparse_train_state(model, params, lr=0.3)
    step = make_sparse_train_step(
        model, dense_opt, lr=0.3, optimizer="row_adagrad", routed=True
    )
    dense_params = {k: params[k] for k in ("bot", "top")}
    emb = params["emb"]
    rng = np.random.default_rng(0)
    b = 128
    losses = []
    for _ in range(60):
        dense = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
        idx_np = np.stack(
            [rng.integers(0, t.num_rows, size=b) for t in cfg.tables]
        ).astype(np.int32)
        labels = (idx_np[0] % 2 == 0).astype(np.float32)
        emb, acc, dense_params, opt_state, loss = step(
            emb, acc, dense_params, opt_state,
            dense, jnp.asarray(idx_np), jnp.ones((2, b), bool),
            jnp.asarray(labels),
        )
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.1
