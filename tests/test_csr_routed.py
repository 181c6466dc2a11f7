"""Routed (all-to-all) CSR lookup — the reference's native ragged wire shape
(emb_host.h:234 ``lookup(uint32_t **indices, uint32_t **offsets, ...)``) on
the multi-chip issue-rate-scaling path (VERDICT r3 next-round item 1).

Contract mirrored from lookup_routed: drop-IMPOSSIBLE at the API default
capacity factor (verified under zipf skew with empty bags — the adversarial
mix), drops counted in-graph below it, parity with the broadcast lookup_csr
for every rowish policy, both replicated and data-sharded wire forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.ops.ragged import pack_bags, shard_csr
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh

TABLES = (
    TableConfig(num_rows=300, dim=16, name="a"),
    TableConfig(num_rows=2000, dim=16, name="b"),
    TableConfig(num_rows=48, dim=16, name="c"),
)

ROWISH = [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def zipf_bags(rng, tables, b, max_len=7, a=1.2):
    """Zipf-skewed variable-length bags incl. EMPTY bags: hot-id duplicates
    all route to one owner (the overflow worst case), empty bags must pool
    to zero through the segment machinery."""
    bags_per_table = []
    for t in tables:
        bags = []
        for _ in range(b):
            n = int(rng.integers(0, max_len))
            ids = np.minimum(rng.zipf(a, size=n) - 1, t.num_rows - 1)
            bags.append(ids.astype(int).tolist())
        bags_per_table.append(bags)
    return bags_per_table


def stack_csr(bags_per_table, cap):
    idxs, offs = [], []
    for bags in bags_per_table:
        idx, off = pack_bags(bags, capacity=cap)
        idx[off[-1]:] = 1  # poison padding with a valid id — must not leak
        idxs.append(idx)
        offs.append(off)
    return jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(offs))


@pytest.mark.parametrize("policy", ROWISH)
@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_routed_csr_parity_vs_broadcast(mesh, policy, combiner):
    """Default cf: zero drops + exact parity with the broadcast CSR path
    under zipf with empty bags, for every rowish policy."""
    rng = np.random.default_rng(7)
    b, cap = 16, 16 * 7
    coll = EmbeddingCollection.create(TABLES, mesh, policy)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    fused = coll.device_put_tables(tables_np)
    idx, off = stack_csr(zipf_bags(rng, TABLES, b), cap)

    want = coll.lookup_csr(fused, idx, off, combiner=combiner)
    got, dropped = coll.lookup_csr(
        fused, idx, off, combiner=combiner, routed=True, return_stats=True
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_routed_csr_data_sharded(mesh):
    """Data-sharded routed CSR (the DP serving form): parity with the
    broadcast data-sharded path, batch-sharded output."""
    rng = np.random.default_rng(11)
    nd, b = 2, 16
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW_HASH)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    fused = coll.device_put_tables(tables_np)
    bags = zipf_bags(rng, TABLES, b)
    idx, off = shard_csr(bags, nd, capacity_per_shard=b * 7 // nd)
    idx, off = jnp.asarray(idx), jnp.asarray(off)

    want = coll.lookup_csr(fused, idx, off, data_sharded=True)
    got, dropped = coll.lookup_csr(
        fused, idx, off, data_sharded=True, routed=True, return_stats=True
    )
    assert int(dropped) == 0
    assert got.shape == (b, len(TABLES), 16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_routed_csr_low_cf_counts_drops(mesh):
    """Forced overflow (contiguous ROW ownership skew at cf=1): drops are
    counted, never silent."""
    rng = np.random.default_rng(5)
    b, cap = 16, 16 * 7
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    fused = coll.init(jax.random.PRNGKey(0))
    idx, off = stack_csr(zipf_bags(rng, TABLES, b), cap)
    _, dropped = coll.lookup_csr(
        fused, idx, off, routed=True, capacity_factor=1.0, return_stats=True
    )
    assert int(dropped) > 0


def test_routed_csr_api_guards(mesh):
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.COLUMN)
    idx = jnp.zeros((3, 8), jnp.int32)
    off = jnp.zeros((3, 3), jnp.int32)
    fused = coll.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="routed lookup_csr requires"):
        coll.lookup_csr(fused, idx, off, routed=True)
    coll2 = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    fused2 = coll2.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="sum/mean"):
        coll2.lookup_csr(fused2, idx, off, routed=True, combiner="max")
    with pytest.raises(ValueError, match="return_stats requires"):
        coll2.lookup_csr(fused2, idx, off, return_stats=True)
