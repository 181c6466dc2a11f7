"""End-to-end: training + checkpoint/resume determinism on the sharded mesh.

The reference's checkpoint story is --save-model/--load-model at the model
layer (README.md:10); here we verify the stronger property that a restored
run continues bit-identically (sharded fused table included)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import (
    DLRMConfig,
    MeshConfig,
    ShardingPolicy,
    TableConfig,
)
from pim_embedding_lookup_tpu.models import DLRM, make_optimizer, make_train_step
from pim_embedding_lookup_tpu.parallel import make_mesh
from pim_embedding_lookup_tpu.utils import checkpoint


def cfg():
    return DLRMConfig(
        dense_dim=4,
        mlp_bot=(8, 8),
        mlp_top=(8, 1),
        tables=(
            TableConfig(num_rows=64, dim=8, name="a"),
            TableConfig(num_rows=96, dim=8, name="b"),
        ),
    )


def batches(config, n, b=32, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        dense = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
        idx = jnp.asarray(
            np.stack(
                [rng.integers(0, t.num_rows, size=b) for t in config.tables]
            ).astype(np.int32)
        )
        mask = jnp.ones((2, b), bool)
        labels = jnp.asarray((rng.random(b) < 0.5).astype(np.float32))
        out.append((dense, idx, mask, labels))
    return out

def test_checkpoint_resume_bitexact(tmp_path):
    mesh = make_mesh(MeshConfig(data=2, model=4))
    config = cfg()
    model = DLRM(config, mesh, ShardingPolicy.ROW)
    opt = make_optimizer(lr=0.1)
    step = make_train_step(model, opt)
    data = batches(config, 10)

    # uninterrupted
    params = model.init(jax.random.PRNGKey(0))
    ost = opt.init(params)
    for bt in data:
        params, ost, loss, _ = step(params, ost, *bt)
    ref = jax.tree.map(np.asarray, params)

    # interrupted at step 5 + restore
    params = model.init(jax.random.PRNGKey(0))
    ost = opt.init(params)
    for bt in data[:5]:
        params, ost, loss, _ = step(params, ost, *bt)
    checkpoint.save(str(tmp_path / "ck"), {"params": params, "opt": ost})
    restored = checkpoint.restore(
        str(tmp_path / "ck"), {"params": params, "opt": ost}
    )
    params2, ost2 = restored["params"], restored["opt"]
    # restored table keeps its sharding
    assert params2["emb"].sharding.is_equivalent_to(params["emb"].sharding, 2)
    for bt in data[5:]:
        params2, ost2, loss, _ = step(params2, ost2, *bt)
    out = jax.tree.map(np.asarray, params2)
    jax.tree.map(np.testing.assert_array_equal, ref, out)
