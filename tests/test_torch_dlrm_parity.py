"""Whole-model forward parity vs a torch DLRM with identical weights.

The reference's acceptance story is dataset-level parity against the CPU
EmbeddingBag model (SURVEY.md §4 item 3).  Stronger version: build the
upstream-style torch DLRM (EmbeddingBag + MLPs + dot interaction, the
structure reconstructed in SURVEY.md §3.3) from OUR parameters and assert
the logits agree."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pim_embedding_lookup_tpu.config import (  # noqa: E402
    DLRMConfig,
    MeshConfig,
    ShardingPolicy,
    TableConfig,
)
from pim_embedding_lookup_tpu.models import DLRM  # noqa: E402
from pim_embedding_lookup_tpu.parallel import make_mesh  # noqa: E402


def torch_dlrm_forward(params_np, config, layout, dense, idx3):
    """Upstream dlrm_s_pytorch-style forward from our param pytree."""

    def mlp(layers, x, last_linear):
        for i, l in enumerate(layers):
            x = x @ torch.from_numpy(l["w"]) + torch.from_numpy(l["b"])
            if not (last_linear and i == len(layers) - 1):
                x = torch.relu(x)
        return x

    x = mlp(params_np["bot"], torch.from_numpy(dense), last_linear=False)
    emb = params_np["emb"]
    ly = []
    for ti, t in enumerate(config.tables):
        off = layout.row_offsets[ti]
        w = torch.from_numpy(emb[off : off + t.num_rows].copy())
        eb = torch.nn.EmbeddingBag.from_pretrained(w, mode="sum", freeze=True)
        flat = torch.from_numpy(idx3[ti].reshape(-1).astype(np.int64))
        offsets = torch.arange(0, idx3.shape[1] * idx3.shape[2], idx3.shape[2])
        ly.append(eb(flat, offsets))
    # dot interaction (lower triangle, no self)
    z = torch.stack([x] + ly, dim=1)  # [B, 1+T, D]
    zz = torch.bmm(z, z.transpose(1, 2))
    nf = z.shape[1]
    li, lj = np.tril_indices(nf, -1)
    flat_zz = zz[:, li, lj]
    top_in = torch.cat([x, flat_zz], dim=1)
    logits = mlp(params_np["top"], top_in, last_linear=True)
    return logits[:, 0].numpy()


def test_full_dlrm_matches_torch(rng):
    config = DLRMConfig(
        dense_dim=13,
        mlp_bot=(32, 16),
        mlp_top=(24, 1),
        tables=tuple(
            TableConfig(num_rows=100 + 31 * i, dim=16, name=f"t{i}")
            for i in range(5)
        ),
    )
    mesh = make_mesh(MeshConfig(data=2, model=4))
    model = DLRM(config, mesh, ShardingPolicy.ROW)
    params = model.init(jax.random.PRNGKey(0))

    b, l = 32, 3
    dense = rng.standard_normal((b, 13)).astype(np.float32)
    idx3 = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in config.tables]
    ).astype(np.int32)
    mask = np.ones((5, b * l), bool)

    ours = np.asarray(
        model.apply(
            params,
            jnp.asarray(dense),
            jnp.asarray(idx3.reshape(5, b * l)),
            jnp.asarray(mask),
        )
    )
    params_np = jax.tree.map(np.asarray, params)
    theirs = torch_dlrm_forward(
        params_np, config, model.collection.layout, dense, idx3
    )
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
