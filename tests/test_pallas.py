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
