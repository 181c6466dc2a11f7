"""CSR (ragged-bag) sparse optimizer step — backward of lookup_csr on the
reference's native wire shape (emb_host.h:234), broadcast and routed
(VERDICT r3 next-round item 1, update side).

Oracles: (a) fixed-L bags must match the dense sparse_update exactly;
(b) variable-length bags incl. empty bags vs a numpy SGD scatter oracle;
(c) routed == broadcast at the default (drop-impossible) capacity factor;
(d) drops counted at a forced-low capacity factor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.ops.ragged import pack_bags, shard_csr
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh
from pim_embedding_lookup_tpu.parallel.sparse_update import (
    init_accumulator,
    sparse_update,
    sparse_update_csr,
)

TABLES = (
    TableConfig(num_rows=120, dim=16, name="a"),
    TableConfig(num_rows=900, dim=16, name="b"),
    TableConfig(num_rows=51, dim=16, name="c"),
)

ROWISH = [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def make_tables(rng):
    return [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]


def var_bags(rng, b, max_len=6):
    bags_per_table = []
    for t in TABLES:
        bags_per_table.append(
            [
                rng.integers(0, t.num_rows, size=rng.integers(0, max_len))
                .astype(int).tolist()
                for _ in range(b)
            ]
        )
    return bags_per_table


def stack_csr(bags_per_table, cap):
    idxs, offs = [], []
    for bags in bags_per_table:
        idx, off = pack_bags(bags, capacity=cap)
        idx[off[-1]:] = 2  # poison padding — must receive no update
        idxs.append(idx)
        offs.append(off)
    return jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(offs))


def sgd_oracle(tables_np, bags_per_table, g, lr):
    out = [t.copy() for t in tables_np]
    for ti, bags in enumerate(bags_per_table):
        for bi, bag in enumerate(bags):
            for r in bag:
                out[ti][r] -= lr * g[bi, ti]
    return out


def unfuse(coll, fused):
    lay = coll.layout
    arr = np.asarray(fused).reshape(-1, lay.dim)
    if lay.policy == ShardingPolicy.ROW_HASH:
        m, rps = lay.num_shards, lay.rows_per_shard
        perm = (np.arange(rps)[None, :] * m + np.arange(m)[:, None]).reshape(-1)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        arr = arr[inv]
    return [
        arr[off : off + t.num_rows]
        for off, t in zip(lay.row_offsets, TABLES)
    ]


@pytest.mark.parametrize("policy", ROWISH + [ShardingPolicy.REPLICATE])
def test_csr_update_sgd_oracle(mesh, policy):
    """Variable-length bags (incl. empty): broadcast CSR update vs numpy."""
    rng = np.random.default_rng(3)
    b, cap = 12, 12 * 6
    coll = EmbeddingCollection.create(TABLES, mesh, policy)
    tables_np = make_tables(rng)
    fused = coll.device_put_tables(tables_np)
    bags = var_bags(rng, b)
    idx, off = stack_csr(bags, cap)
    g = rng.standard_normal((b, len(TABLES), 16)).astype(np.float32)

    new_fused, _ = sparse_update_csr(
        coll, fused, init_accumulator(coll), idx, off, jnp.asarray(g), lr=0.05
    )
    got = unfuse(coll, new_fused)
    want = sgd_oracle(tables_np, bags, g, 0.05)
    for ti in range(len(TABLES)):
        np.testing.assert_allclose(got[ti], want[ti], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("optimizer", ["sgd", "row_adagrad"])
def test_csr_update_matches_dense_fixed_l(mesh, optimizer):
    """Fixed-L bags: CSR and dense update forms agree bit-for-bit in spirit
    (same math, same order up to scatter determinism)."""
    rng = np.random.default_rng(9)
    b, l = 8, 4
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    tables_np = make_tables(rng)
    idx3 = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    g = jnp.asarray(rng.standard_normal((b, len(TABLES), 16)).astype(np.float32))

    f_dense, a_dense = sparse_update(
        coll, coll.device_put_tables(tables_np), init_accumulator(coll),
        jnp.asarray(idx3.reshape(3, b * l)), jnp.ones((3, b * l), bool), g,
        lr=0.1, optimizer=optimizer,
    )
    offsets = np.tile(np.arange(b + 1) * l, (3, 1)).astype(np.int32)
    f_csr, a_csr = sparse_update_csr(
        coll, coll.device_put_tables(tables_np), init_accumulator(coll),
        jnp.asarray(idx3.reshape(3, b * l)), jnp.asarray(offsets), g,
        lr=0.1, optimizer=optimizer,
    )
    np.testing.assert_allclose(
        np.asarray(f_csr), np.asarray(f_dense), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a_csr), np.asarray(a_dense), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("policy", ROWISH)
def test_routed_csr_update_parity(mesh, policy):
    """Routed CSR update at the default cf: zero drops, parity with the
    broadcast CSR update (row_adagrad — exercises the accumulator path)."""
    rng = np.random.default_rng(13)
    b, cap = 16, 16 * 6
    coll = EmbeddingCollection.create(TABLES, mesh, policy)
    tables_np = make_tables(rng)
    bags = var_bags(rng, b)
    idx, off = stack_csr(bags, cap)
    g = jnp.asarray(rng.standard_normal((b, len(TABLES), 16)).astype(np.float32))

    f_r, a_r, drops = sparse_update_csr(
        coll, coll.device_put_tables(tables_np), init_accumulator(coll),
        idx, off, g, lr=0.1, optimizer="row_adagrad", routed=True,
        return_stats=True,
    )
    assert int(drops) == 0
    f_b, a_b = sparse_update_csr(
        coll, coll.device_put_tables(tables_np), init_accumulator(coll),
        idx, off, g, lr=0.1, optimizer="row_adagrad",
    )
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_r), np.asarray(a_b), rtol=1e-5, atol=1e-6)


def test_routed_csr_update_low_cf_counts_drops(mesh):
    rng = np.random.default_rng(5)
    b, cap = 16, 16 * 6
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    fused = coll.init(jax.random.PRNGKey(0))
    # zipf-hot bags: duplicates of hot rows funnel into one owner bucket
    bags = [
        [
            np.minimum(rng.zipf(1.2, size=6) - 1, t.num_rows - 1)
            .astype(int).tolist()
            for _ in range(b)
        ]
        for t in TABLES
    ]
    idx, off = stack_csr(bags, cap)
    g = jnp.asarray(rng.standard_normal((b, len(TABLES), 16)).astype(np.float32))
    _, _, drops = sparse_update_csr(
        coll, fused, init_accumulator(coll), idx, off, g, lr=0.1,
        routed=True, capacity_factor=1.0, return_stats=True,
    )
    assert int(drops) > 0


def test_data_sharded_csr_update(mesh):
    """Data-sharded wire form: parity with the replicated form on the same
    logical bags (routed, default cf)."""
    rng = np.random.default_rng(21)
    nd, b = 2, 12
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW_HASH)
    tables_np = make_tables(rng)
    bags = var_bags(rng, b)
    g = jnp.asarray(rng.standard_normal((b, len(TABLES), 16)).astype(np.float32))

    idx_r, off_r = stack_csr(bags, b * 6)
    f_rep, _ = sparse_update_csr(
        coll, coll.device_put_tables(tables_np), init_accumulator(coll),
        idx_r, off_r, g, lr=0.1, routed=True,
    )
    idx_s, off_s = shard_csr(bags, nd, capacity_per_shard=b * 6 // nd)
    f_ds, _ = sparse_update_csr(
        coll, coll.device_put_tables(tables_np), init_accumulator(coll),
        jnp.asarray(idx_s), jnp.asarray(off_s), g, lr=0.1, routed=True,
        data_sharded=True,
    )
    np.testing.assert_allclose(
        np.asarray(f_ds), np.asarray(f_rep), rtol=1e-5, atol=1e-6
    )


def test_hybrid_csr_update(mesh):
    """sparse_update_hybrid_csr: bucketed-MXU small set + (routed) big-set
    CSR scatter, parity vs a numpy SGD oracle on variable-length bags."""
    from pim_embedding_lookup_tpu.parallel.hybrid import (
        HybridEmbeddingCollection,
        init_accumulator_hybrid,
        sparse_update_hybrid_csr,
    )

    tables = (
        TableConfig(num_rows=50, dim=16, name="tiny"),
        TableConfig(num_rows=30_000, dim=16, name="big1"),
        TableConfig(num_rows=200, dim=16, name="small"),
    )
    rng = np.random.default_rng(17)
    coll = HybridEmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    b, cap = 12, 12 * 6
    bags = [
        [
            rng.integers(0, t.num_rows, size=rng.integers(0, 6))
            .astype(int).tolist()
            for _ in range(b)
        ]
        for t in tables
    ]
    idxs, offs = [], []
    for tb in bags:
        i, o = pack_bags(tb, capacity=cap)
        i[o[-1]:] = 3  # poison padding
        idxs.append(i)
        offs.append(o)
    idx = jnp.asarray(np.stack(idxs))
    off = jnp.asarray(np.stack(offs))
    g = rng.standard_normal((b, len(tables), 16)).astype(np.float32)

    for routed in (False, True):
        params = coll.device_put_tables(tables_np)
        new_p, _, drops = sparse_update_hybrid_csr(
            coll, params, init_accumulator_hybrid(coll), idx, off,
            jnp.asarray(g), lr=0.05, routed=routed, return_stats=True,
        )
        assert int(drops) == 0
        want = sgd_oracle(tables_np, bags, g, 0.05)
        # small set: unfuse the bucket-padded replicated array
        got_small = coll.small.unfuse_host(new_p["small"])
        for pos, ti in enumerate(coll.small_ids):
            np.testing.assert_allclose(
                got_small[pos], want[ti], rtol=1e-4, atol=1e-5,
                err_msg=f"small table {ti} routed={routed}",
            )
        got_big = coll.big.unfuse_host(new_p["big"])
        for pos, ti in enumerate(coll.big_ids):
            np.testing.assert_allclose(
                got_big[pos], want[ti], rtol=1e-4, atol=1e-5,
                err_msg=f"big table {ti} routed={routed}",
            )
