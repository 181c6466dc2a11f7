"""bf16 table storage: half the HBM traffic, f32 accumulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=1, model=4))


def test_bf16_lookup_close_to_f32(mesh, rng):
    tables = (
        TableConfig(num_rows=300, dim=16, name="a", dtype=jnp.bfloat16),
        TableConfig(num_rows=120, dim=16, name="b", dtype=jnp.bfloat16),
    )
    coll = EmbeddingCollection.create(tables, mesh, ShardingPolicy.ROW)
    fused16 = coll.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    assert fused16.dtype == jnp.bfloat16
    fused32 = fused16.astype(jnp.float32)

    b, l = 16, 8
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, t.num_rows, size=b * l) for t in tables]
        ).astype(np.int32)
    )
    mask = jnp.ones((2, b * l), bool)
    out16 = coll.lookup(fused16, idx, mask, batch_size=b)
    out32 = coll.lookup(fused32, idx, mask, batch_size=b)
    assert out16.dtype == jnp.float32  # f32 accumulation
    # identical inputs (bf16 values exactly representable in f32) ->
    # identical pooled sums
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=1e-6, atol=1e-6
    )


def test_routed_bf16_wire_parity(rng):
    """bf16 storage: routed lookup (which now rides the return all_to_all
    at bf16 — exact, rows are selected not accumulated) matches the
    broadcast path bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, TableConfig,
    )
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh

    tables = (
        TableConfig(num_rows=500, dim=16, name="a"),
        TableConfig(num_rows=3000, dim=16, name="b"),
    )
    mesh = make_mesh(MeshConfig(data=2, model=4))
    coll = EmbeddingCollection.create(tables, mesh, ShardingPolicy.ROW_HASH)
    fused = coll.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    assert fused.dtype == jnp.bfloat16
    b, l = 16, 3
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.num_rows, size=b * l) for t in tables]
    ).astype(np.int32))
    mask = jnp.asarray(rng.random((2, b * l)) < 0.8)
    routed = coll.lookup_routed(fused, idx, mask, batch_size=b)
    broadcast = coll.lookup(fused, idx, mask, batch_size=b)
    np.testing.assert_array_equal(np.asarray(routed), np.asarray(broadcast))
