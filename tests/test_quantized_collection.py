"""Sharded int8 collection: 4x capacity, f32 accumulation, inference-only.
Parity vs the f32 oracle within symmetric-quantization error (the analog
of the reference's /1e9 fixed-point decode tolerance, load_generator.c:58)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import (
    QuantizedEmbeddingCollection,
    make_mesh,
)

TABLES = (
    TableConfig(num_rows=100, dim=16, name="a"),
    TableConfig(num_rows=1000, dim=16, name="b"),
    TableConfig(num_rows=37, dim=16, name="c"),
    TableConfig(num_rows=4000, dim=16, name="d"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def oracle_pooled(tables_np, idx, mask):
    t, b, l = idx.shape
    d = tables_np[0].shape[1]
    out = np.zeros((b, t, d), np.float32)
    for ti in range(t):
        for bi in range(b):
            for li in range(l):
                if mask[ti, bi, li]:
                    out[bi, ti] += tables_np[ti][idx[ti, bi, li]]
    return out


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize(
    "policy",
    [
        ShardingPolicy.REPLICATE,
        ShardingPolicy.ROW,
        ShardingPolicy.ROW_HASH,
        ShardingPolicy.TABLE_WISE,
    ],
)
def test_quantized_lookup_parity(mesh, policy, packed):
    rng = np.random.default_rng(0)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, policy, packed=packed
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    assert params["q"].dtype == jnp.int8
    b, l = 16, 5
    idx = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    mask = rng.random((len(TABLES), b, l)) < 0.7
    out = coll.lookup(
        params,
        jnp.asarray(idx.reshape(len(TABLES), b * l)),
        jnp.asarray(mask.reshape(len(TABLES), b * l)),
        batch_size=b,
    )
    expected = oracle_pooled(tables_np, idx, mask)
    # symmetric int8: |err| <= absmax/254 per element, l entries per bag
    err = np.abs(np.asarray(out) - expected)
    bound = l * np.abs(np.stack([t.max() for t in tables_np])).max() / 254 * 1.5
    assert err.max() <= bound + 1e-5, (err.max(), bound)


def test_quantized_init_bounds(mesh):
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    params = coll.init(jax.random.PRNGKey(0))
    assert params["q"].shape == (coll.layout.storage_rows, 128)
    assert params["scale"].shape == (coll.layout.total_rows,)
    s = np.asarray(params["scale"])
    assert (s > 0).all() and s.max() <= 1.0 / 127 + 1e-9


def test_quantized_memory_footprint(mesh):
    """The capacity claim: int8 params are ~1/4 of f32 bytes."""
    coll = QuantizedEmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    lay = coll.layout
    int8_bytes = lay.total_rows * lay.dim + lay.total_rows * 4
    f32_bytes = lay.total_rows * lay.dim * 4
    assert int8_bytes < 0.4 * f32_bytes


def test_quantized_rejects_column(mesh):
    with pytest.raises(ValueError):
        QuantizedEmbeddingCollection.create(
            TABLES, mesh, ShardingPolicy.COLUMN
        )
