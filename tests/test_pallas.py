"""Pallas fused gather+pool kernel vs the numpy oracle.

Runs in Mosaic interpret mode on the CPU backend — the debug-mode sanitizer
analog called for in SURVEY.md §5 (the reference has no simulator harness;
we make interpret-mode a first-class test target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pim_embedding_lookup_tpu import ops
from pim_embedding_lookup_tpu.ops import ragged


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _run(table, bags, b, cap, **kw):
    indices, offsets = ragged.pack_bags(bags, capacity=cap)
    out = ops.pallas_embedding_bag_csr(
        jnp.asarray(table), jnp.asarray(indices), jnp.asarray(offsets),
        batch_size=b, **kw,
    )
    return np.asarray(out), indices, offsets


def test_pallas_toy(oracle):
    table = np.stack([(r + 1) * np.arange(1, 9, dtype=np.float32) for r in range(4)])
    bags = [[1, 3, 2, 0]] * 16
    out, indices, offsets = _run(table, bags, 16, 64)
    np.testing.assert_allclose(out, oracle(table, indices, offsets), rtol=1e-6)


def test_pallas_ragged_random(rng, oracle):
    n, d, b = 300, 16, 24
    table = rng.standard_normal((n, d), dtype=np.float32)
    bags = [rng.integers(0, n, size=rng.integers(0, 9)).tolist() for _ in range(b)]
    out, indices, offsets = _run(table, bags, b, b * 9)
    np.testing.assert_allclose(out, oracle(table, indices, offsets), rtol=1e-5, atol=1e-5)


def test_pallas_unaligned_batch(rng, oracle):
    """batch not a multiple of tile_b exercises the padded-offsets tail."""
    n, d, b = 100, 32, 13
    table = rng.standard_normal((n, d), dtype=np.float32)
    bags = [rng.integers(0, n, size=3).tolist() for _ in range(b)]
    out, indices, offsets = _run(table, bags, b, b * 3)
    assert out.shape == (b, d)
    np.testing.assert_allclose(out, oracle(table, indices, offsets), rtol=1e-5, atol=1e-5)


def test_pallas_deep_pipeline(rng, oracle):
    """nbuf larger than some bag lengths — warm-up/tail interplay."""
    n, d, b = 64, 16, 8
    table = rng.standard_normal((n, d), dtype=np.float32)
    bags = [rng.integers(0, n, size=rng.integers(1, 20)).tolist() for _ in range(b)]
    out, indices, offsets = _run(table, bags, b, b * 20, nbuf=16, tile_b=8)
    np.testing.assert_allclose(out, oracle(table, indices, offsets), rtol=1e-5, atol=1e-5)


def test_pallas_grad(rng):
    n, d, b = 32, 8, 8
    table = rng.standard_normal((n, d), dtype=np.float32)
    bags = [rng.integers(0, n, size=3).tolist() for _ in range(b)]
    indices, offsets = ragged.pack_bags(bags, capacity=b * 3)
    g = rng.standard_normal((b, d), dtype=np.float32)

    def loss(t):
        out = ops.pallas_embedding_bag_csr(
            t, jnp.asarray(indices), jnp.asarray(offsets), batch_size=b
        )
        return jnp.sum(out * jnp.asarray(g))

    dtable = np.asarray(jax.grad(loss)(jnp.asarray(table)))
    expected = np.zeros_like(table)
    for i, bag in enumerate(bags):
        for r in bag:
            expected[r] += g[i]
    np.testing.assert_allclose(dtable, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("d,b,l,tile_b,nbuf", [
    (16, 32, 4, 8, 8),    # packed, multi-hot
    (16, 64, 1, 8, 16),   # packed, single-hot (headline shape class)
    (16, 128, 1, 64, 32), # packed, big tile
    (128, 16, 2, 8, 4),   # row-DMA (d == 128)
])
def test_pallas_fixedl(rng, d, b, l, tile_b, nbuf):
    """Production-shape-safe fixed-L kernel (streamed SMEM index blocks —
    the CSR form's whole-array scalar prefetch overflows SMEM at real
    sizes, docs/PERF.md pallas status)."""
    from pim_embedding_lookup_tpu.ops.pallas_lookup import (
        pack_table_lanes,
        pallas_embedding_bag_fixedl,
    )

    n = 500
    table = rng.standard_normal((n, d)).astype(np.float32)
    packed = (np.asarray(pack_table_lanes(jnp.asarray(table)))
              if d < 128 else table)
    idx = rng.integers(0, n, size=b * l).astype(np.int32)
    out = pallas_embedding_bag_fixedl(
        jnp.asarray(packed), d, jnp.asarray(idx),
        pooling=l, batch_size=b, tile_b=tile_b, nbuf=nbuf,
    )
    ref = table[idx].reshape(b, l, d).sum(1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("policy", ["replicate", "row_hash"])
@pytest.mark.parametrize("combiner", ["sum", "mean"])
def test_pallas_gather_dispatch_parity(rng, policy, combiner):
    """EmbeddingCollection can dispatch the pallas row-DMA kernel for
    full-width (dim==128, pack==1) f32 tables (PALLAS_GATHER="on"/"auto";
    default off — measured ~1.35x BEHIND the XLA gather, docs/PERF.md).
    Forced on + interpret mode here; must match the XLA path
    bit-for-bit-ish.

    Single-device mesh ON PURPOSE: the Mosaic interpret emulator under a
    multi-device CPU shard_map takes tens of minutes for even a 64-entry
    kernel (measured >570s vs 0.4s for the XLA body — DMA-semaphore
    emulation under SPMD), while the per-shard local body is the same
    function either way.  Multi-device dispatch coverage rides the XLA
    paths (test_parallel/test_packed); kernel-vs-oracle coverage is
    test_pallas_fixedl."""
    import pim_embedding_lookup_tpu.parallel.collection as C
    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, TableConfig,
    )
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh

    mesh = make_mesh(MeshConfig(data=1, model=1))
    tables = (
        TableConfig(num_rows=300, dim=128, name="a"),
        TableConfig(num_rows=900, dim=128, name="b"),
    )
    coll = EmbeddingCollection.create(tables, mesh, ShardingPolicy(policy))
    assert coll.layout.pack == 1 and coll.layout.storage_width == 128
    tables_np = [
        rng.standard_normal((t.num_rows, 128)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    b, l = 16, 4
    idx = np.stack([
        rng.integers(0, t.num_rows, size=b * l) for t in tables
    ]).astype(np.int32)
    mask = rng.random((2, b * l)) < 0.9
    args = (jnp.asarray(idx), jnp.asarray(mask))

    old = C.PALLAS_GATHER
    try:
        C.PALLAS_GATHER = "off"
        ref = np.asarray(
            coll.lookup(fused, *args, batch_size=b, combiner=combiner)
        )
        C.PALLAS_GATHER = "on"
        out = coll.lookup(fused, *args, batch_size=b, combiner=combiner)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    finally:
        C.PALLAS_GATHER = old
