"""Hot-row replication cache (SURVEY §7 hard part (c)): zipf-hot rows are
served from a replicated snapshot and excluded from the routed all-to-all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh
from pim_embedding_lookup_tpu.parallel.hotcache import (
    build_hot_cache,
    hot_ids_from_sample,
)

TABLES = (
    TableConfig(num_rows=500, dim=16, name="a"),
    TableConfig(num_rows=5000, dim=16, name="b"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def zipf_query(rng, tables, b, l):
    idx = np.stack([
        np.minimum(rng.zipf(1.2, size=(b, l)) - 1, t.num_rows - 1)
        for t in tables
    ]).astype(np.int32)
    mask = np.ones((len(tables), b, l), bool)
    return idx, mask


@pytest.mark.parametrize("packed", [False, True])
def test_hot_cache_routed_parity(mesh, packed):
    rng = np.random.default_rng(0)
    coll = EmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=packed
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    fused = coll.device_put_tables(tables_np)
    b, l = 16, 4
    idx, mask = zipf_query(rng, TABLES, b, l)
    t = len(TABLES)
    idx2 = jnp.asarray(idx.reshape(t, b * l))
    mask2 = jnp.asarray(mask.reshape(t, b * l))

    hot = hot_ids_from_sample(coll, idx.reshape(t, b * l), k=32)
    assert len(hot) <= 32 and (np.diff(hot) > 0).all()
    hot_ids, hot_rows = build_hot_cache(coll, fused, hot)

    # cache rows must equal the true table rows
    offs = np.asarray(coll.layout.row_offsets)
    for gi, row in zip(np.asarray(hot_ids), np.asarray(hot_rows)):
        ti = int(np.searchsorted(offs, gi, side="right") - 1)
        local = gi - offs[ti]
        if local < TABLES[ti].num_rows:
            np.testing.assert_allclose(
                row, tables_np[ti][local], rtol=1e-6, atol=1e-6
            )

    out_hot = coll.lookup_routed(
        fused, idx2, mask2, batch_size=b, hot_cache=(hot_ids, hot_rows)
    )
    out_plain = coll.lookup(fused, idx2, mask2, batch_size=b)
    np.testing.assert_allclose(
        np.asarray(out_hot), np.asarray(out_plain), rtol=1e-5, atol=1e-6
    )


def test_hot_cache_reduces_routing_load(mesh):
    """With the hot set cached, a zipf stream routes dramatically fewer
    entries — the cache absorbs the head of the distribution."""
    rng = np.random.default_rng(1)
    coll = EmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW_HASH)
    b, l = 64, 4
    idx, _ = zipf_query(rng, TABLES, b, l)
    t = len(TABLES)
    flat = idx.reshape(t, b * l)
    hot = hot_ids_from_sample(coll, flat, k=32)
    offs = np.asarray(coll.layout.row_offsets, dtype=np.int64)
    fused_ids = (flat.astype(np.int64) + offs[:, None]).reshape(-1)
    hit_frac = np.isin(fused_ids, hot).mean()
    assert hit_frac > 0.5, hit_frac  # zipf(1.2): top-32 rows >> half the traffic
