"""Parity vs torch.nn.EmbeddingBag — the exact host engine the reference
offloads (dlrm's apply_emb uses EmbeddingBag mode='sum'; SURVEY.md §3.3).
Acceptance mirrors the reference's dataset-level parity check (§4 item 3):
same tables, same bags -> same pooled vectors."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pim_embedding_lookup_tpu import ops  # noqa: E402
from pim_embedding_lookup_tpu.config import Combiner  # noqa: E402
from pim_embedding_lookup_tpu.ops import ragged  # noqa: E402


@pytest.mark.parametrize("mode", ["sum", "mean", "max"])
def test_embedding_bag_matches_torch(rng, mode):
    n, d, b = 500, 16, 64
    table = rng.standard_normal((n, d)).astype(np.float32)
    lengths = rng.integers(1, 12, size=b)
    bags = [rng.integers(0, n, size=l).tolist() for l in lengths]
    indices, offsets = ragged.pack_bags(bags, capacity=b * 12)

    eb = torch.nn.EmbeddingBag.from_pretrained(
        torch.from_numpy(table), mode=mode, freeze=True
    )
    flat = torch.from_numpy(
        np.concatenate([np.asarray(bg, np.int64) for bg in bags])
    )
    toffsets = torch.from_numpy(np.asarray(offsets[:-1], np.int64))
    expected = eb(flat, toffsets).numpy()

    out = ops.embedding_bag_csr(
        jnp.asarray(table), jnp.asarray(indices), jnp.asarray(offsets),
        batch_size=b, combiner=Combiner(mode),
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_grad_matches_torch(rng):
    n, d, b = 100, 8, 16
    table = rng.standard_normal((n, d)).astype(np.float32)
    bags = [rng.integers(0, n, size=4).tolist() for _ in range(b)]
    indices, offsets = ragged.pack_bags(bags, capacity=b * 4)
    g = rng.standard_normal((b, d)).astype(np.float32)

    # torch backward
    w = torch.from_numpy(table.copy()).requires_grad_(True)
    eb = torch.nn.functional.embedding_bag
    flat = torch.from_numpy(np.concatenate([np.asarray(bg, np.int64) for bg in bags]))
    toffsets = torch.from_numpy(np.asarray(offsets[:-1], np.int64))
    out = eb(flat, w, toffsets, mode="sum")
    out.backward(torch.from_numpy(g))
    expected = w.grad.numpy()

    import jax

    def loss(t):
        o = ops.embedding_bag_csr(
            t, jnp.asarray(indices), jnp.asarray(offsets), batch_size=b
        )
        return jnp.sum(o * jnp.asarray(g))

    dtable = np.asarray(jax.grad(loss)(jnp.asarray(table)))
    np.testing.assert_allclose(dtable, expected, rtol=1e-5, atol=1e-5)
