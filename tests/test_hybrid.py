"""Hybrid (MXU small-table + gather big-table) collection tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import make_mesh
from pim_embedding_lookup_tpu.parallel.hybrid import HybridEmbeddingCollection

TABLES = (
    TableConfig(num_rows=50, dim=16, name="tiny"),
    TableConfig(num_rows=40_000, dim=16, name="big1"),
    TableConfig(num_rows=300, dim=16, name="small"),
    TableConfig(num_rows=60_000, dim=16, name="big2"),
    TableConfig(num_rows=7, dim=16, name="micro"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def test_split_and_routing(mesh):
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW, mxu_threshold=1000
    )
    # small set ordered by MXU bucket size (pow2 padding): 7->8, 50->64,
    # 300->512
    assert coll.small_ids == (4, 0, 2)
    assert coll.big_ids == (1, 3)
    # perm maps original order -> concat(small, big) positions
    order = list(coll.small_ids) + list(coll.big_ids)
    for t in range(5):
        assert order[coll.perm[t]] == t


def test_hybrid_matches_oracle(mesh, rng):
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW, mxu_threshold=1000
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32) for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b, l = 16, 3
    idx3 = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    mask3 = rng.random((5, b, l)) < 0.8
    out = coll.lookup(
        params,
        jnp.asarray(idx3.reshape(5, b * l)),
        jnp.asarray(mask3.reshape(5, b * l)),
        batch_size=b,
    )
    expected = np.zeros((b, 5, 16), np.float32)
    for ti in range(5):
        for bi in range(b):
            for li in range(l):
                if mask3[ti, bi, li]:
                    expected[bi, ti] += tables_np[ti][idx3[ti, bi, li]]
    # small tables ride a bf16 matmul: weights rounded to bf16 (~0.4% rel)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-2, atol=1e-2)


def test_hybrid_grads_flow(mesh, rng):
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW, mxu_threshold=1000
    )
    params = coll.init(jax.random.PRNGKey(0))
    b = 8
    idx = jnp.asarray(
        np.stack([rng.integers(0, t.num_rows, size=b) for t in TABLES]).astype(
            np.int32
        )
    )
    mask = jnp.ones((5, b), bool)

    def loss(p):
        return jnp.sum(coll.lookup(p, idx, mask, batch_size=b) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["small"]).sum()) > 0
    assert float(jnp.abs(g["big"]).sum()) > 0


def test_all_small_or_all_big(mesh, rng):
    small_only = HybridEmbeddingCollection.create(
        TABLES[:1], mesh, ShardingPolicy.ROW, mxu_threshold=1000
    )
    assert small_only.big is None
    big_only = HybridEmbeddingCollection.create(
        TABLES[1:2], mesh, ShardingPolicy.ROW, mxu_threshold=1000
    )
    assert big_only.small is None
    for coll, t in [(small_only, TABLES[0]), (big_only, TABLES[1])]:
        params = coll.init(jax.random.PRNGKey(1))
        idx = jnp.asarray(rng.integers(0, t.num_rows, size=(1, 8)).astype(np.int32))
        out = coll.lookup(params, idx, jnp.ones((1, 8), bool), batch_size=8)
        assert out.shape == (8, 1, 16)


def test_hybrid_dlrm_sparse_training_learns(mesh):
    from pim_embedding_lookup_tpu.config import DLRMConfig
    from pim_embedding_lookup_tpu.models import DLRM
    from pim_embedding_lookup_tpu.models.sparse_train import (
        make_sparse_train_state,
        make_sparse_train_step,
    )

    cfg = DLRMConfig(
        dense_dim=4,
        mlp_bot=(16, 16),
        mlp_top=(8, 1),
        tables=(
            TableConfig(num_rows=40, dim=16, name="s"),
            TableConfig(num_rows=5000, dim=16, name="b"),
        ),
    )
    model = DLRM(cfg, mesh, ShardingPolicy.ROW, hybrid=True)
    params = model.init(jax.random.PRNGKey(0))
    dense_opt, opt_state, acc = make_sparse_train_state(model, params, lr=0.3)
    step = make_sparse_train_step(model, dense_opt, lr=0.3, optimizer="row_adagrad")
    dense_params = {k: params[k] for k in ("bot", "top")}
    emb = params["emb"]
    rng = np.random.default_rng(0)
    b = 128
    losses = []
    for _ in range(80):
        dense = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
        idx_np = np.stack(
            [rng.integers(0, t.num_rows, size=b) for t in cfg.tables]
        ).astype(np.int32)
        labels = (idx_np[0] % 2 == 0).astype(np.float32)
        emb, acc, dense_params, opt_state, loss = step(
            emb, acc, dense_params, opt_state,
            dense, jnp.asarray(idx_np), jnp.ones((2, b), bool),
            jnp.asarray(labels),
        )
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.1
