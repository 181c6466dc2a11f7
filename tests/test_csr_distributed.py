"""Distributed CSR (ragged) lookup vs oracle under every sharding policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.ops.ragged import pack_bags
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh

TABLES = (
    TableConfig(num_rows=200, dim=16, name="a"),
    TableConfig(num_rows=1000, dim=16, name="b"),
    TableConfig(num_rows=64, dim=16, name="c"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


@pytest.mark.parametrize(
    "policy",
    [ShardingPolicy.REPLICATE, ShardingPolicy.ROW, ShardingPolicy.COLUMN,
     ShardingPolicy.TABLE_WISE],
)
def test_csr_lookup_all_policies(mesh, rng, policy):
    b, cap = 12, 12 * 7
    coll = EmbeddingCollection.create(TABLES, mesh, policy)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32) for t in TABLES
    ]
    fused = coll.device_put_tables(tables_np)

    all_idx, all_off, bags_per_table = [], [], []
    for t in TABLES:
        bags = [
            rng.integers(0, t.num_rows, size=rng.integers(0, 7)).tolist()
            for _ in range(b)
        ]
        idx, off = pack_bags(bags, capacity=cap)
        # poison padding with a valid id — must not leak
        idx[off[-1]:] = 1
        all_idx.append(idx)
        all_off.append(off)
        bags_per_table.append(bags)

    out = coll.lookup_csr(
        fused, jnp.asarray(np.stack(all_idx)), jnp.asarray(np.stack(all_off))
    )
    assert out.shape == (b, len(TABLES), 16)
    expected = np.zeros((b, len(TABLES), 16), np.float32)
    for ti, bags in enumerate(bags_per_table):
        for bi, bag in enumerate(bags):
            for r in bag:
                expected[bi, ti] += tables_np[ti][r]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_csr_matches_dense(mesh, rng):
    """Fixed-length bags: CSR and dense forms agree."""
    b, l = 8, 4
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32) for t in TABLES
    ]
    fused = coll.device_put_tables(tables_np)
    idx3 = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    dense_out = coll.lookup(
        fused,
        jnp.asarray(idx3.reshape(3, b * l)),
        jnp.ones((3, b * l), bool),
        batch_size=b,
    )
    offsets = np.tile(np.arange(b + 1) * l, (3, 1)).astype(np.int32)
    csr_out = coll.lookup_csr(
        fused, jnp.asarray(idx3.reshape(3, b * l)), jnp.asarray(offsets)
    )
    np.testing.assert_allclose(
        np.asarray(dense_out), np.asarray(csr_out), rtol=1e-5, atol=1e-5
    )
