"""Sparse scatter-update training path vs the dense-grad reference step.

The two steps must produce numerically identical parameters after an SGD
update (the sparse path is an exact re-expression of the dense backward,
not an approximation)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pim_embedding_lookup_tpu.config import (
    DLRMConfig,
    MeshConfig,
    ShardingPolicy,
    TableConfig,
)
from pim_embedding_lookup_tpu.models import DLRM, make_optimizer, make_train_step
from pim_embedding_lookup_tpu.models.sparse_train import (
    make_sparse_train_state,
    make_sparse_train_step,
)
from pim_embedding_lookup_tpu.parallel import make_mesh
from pim_embedding_lookup_tpu.parallel.sparse_update import (
    init_accumulator,
    sparse_update,
)


def config(dim=8, tables=3):
    return DLRMConfig(
        dense_dim=4,
        mlp_bot=(16, dim),
        mlp_top=(8, 1),
        tables=tuple(
            TableConfig(num_rows=60 + 10 * i, dim=dim, name=f"t{i}")
            for i in range(tables)
        ),
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def make_batch(cfg, b=16, l=3, seed=0):
    rng = np.random.default_rng(seed)
    nt = len(cfg.tables)
    dense = jnp.asarray(rng.standard_normal((b, cfg.dense_dim)).astype(np.float32))
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, t.num_rows, size=b * l) for t in cfg.tables]
        ).astype(np.int32)
    )
    mask = jnp.asarray(rng.random((nt, b * l)) < 0.8)
    labels = jnp.asarray((rng.random(b) < 0.5).astype(np.float32))
    return dense, idx, mask, labels


@pytest.mark.parametrize(
    "policy",
    [ShardingPolicy.REPLICATE, ShardingPolicy.ROW, ShardingPolicy.COLUMN,
     ShardingPolicy.TABLE_WISE],
)
def test_sparse_sgd_matches_dense_backward(mesh, policy):
    cfg = config(dim=16)  # 16 divides model axis 4 for COLUMN
    lr = 0.1
    model = DLRM(cfg, mesh, policy)
    params = model.init(jax.random.PRNGKey(0))
    dense, idx, mask, labels = make_batch(cfg)

    # dense-grad reference step
    opt = make_optimizer(lr=lr)
    ref_step = make_train_step(model, opt)
    ref_params, _, ref_loss, _ = ref_step(
        params, opt.init(params), dense, idx, mask, labels
    )

    # sparse path
    dense_opt, opt_state, acc = make_sparse_train_state(model, params, lr=lr)
    step = make_sparse_train_step(model, dense_opt, lr=lr, optimizer="sgd")
    dense_params = {k: params[k] for k in ("bot", "top")}
    emb, acc, dense_params, opt_state, loss = step(
        params["emb"], acc, dense_params, opt_state, dense, idx, mask, labels
    )

    assert abs(float(loss) - float(ref_loss)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(ref_params["emb"]), rtol=1e-5, atol=1e-6
    )
    for k in ("bot", "top"):
        for la, lb in zip(dense_params[k], ref_params[k]):
            np.testing.assert_allclose(
                np.asarray(la["w"]), np.asarray(lb["w"]), rtol=1e-5, atol=1e-6
            )


def test_row_adagrad_update(mesh):
    """Row-wise adagrad: acc accumulates mean g^2 per touched row and the
    update is scaled by rsqrt(acc+eps); untouched rows stay put."""
    cfg = config(dim=8, tables=2)
    model = DLRM(cfg, mesh, ShardingPolicy.ROW)
    coll = model.collection
    fused0 = coll.init(jax.random.PRNGKey(1))
    acc0 = init_accumulator(coll)

    b, l = 4, 2
    rng = np.random.default_rng(3)
    idx3 = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in cfg.tables]
    ).astype(np.int32)
    idx = jnp.asarray(idx3.reshape(2, b * l))
    mask = jnp.ones((2, b * l), bool)
    g = jnp.asarray(rng.standard_normal((b, 2, 8)).astype(np.float32))

    lr, eps = 0.5, 1e-8
    fused, acc = sparse_update(
        coll, fused0, acc0, idx, mask, g, lr=lr, optimizer="row_adagrad", eps=eps
    )
    fused0_np, fused_np = np.asarray(fused0), np.asarray(fused)
    acc_np = np.asarray(acc)

    # oracle
    idx_np, g_np = idx3, np.asarray(g)
    exp_acc = np.zeros_like(acc_np)
    touched = set()
    entries = []
    for ti, off in enumerate(coll.layout.row_offsets):
        for bi in range(b):
            for li in range(l):
                r = off + idx_np[ti, bi, li]
                ge = g_np[bi, ti]
                exp_acc[r] += np.mean(ge * ge)
                entries.append((r, ge))
                touched.add(r)
    np.testing.assert_allclose(acc_np, exp_acc, rtol=1e-5, atol=1e-7)
    # untouched rows unchanged
    untouched = sorted(set(range(fused0_np.shape[0])) - touched)
    np.testing.assert_array_equal(fused_np[untouched], fused0_np[untouched])
    # touched rows: sum of -lr*rsqrt(acc_final+eps)*g contributions
    exp = fused0_np.copy()
    for r, ge in entries:
        exp[r] -= lr * ge / np.sqrt(exp_acc[r] + eps)
    np.testing.assert_allclose(fused_np, exp, rtol=1e-4, atol=1e-5)


def test_sparse_training_learns(mesh):
    cfg = config(dim=8, tables=2)
    model = DLRM(cfg, mesh, ShardingPolicy.ROW)
    params = model.init(jax.random.PRNGKey(0))
    dense_opt, opt_state, acc = make_sparse_train_state(model, params, lr=0.3)
    step = make_sparse_train_step(model, dense_opt, lr=0.3, optimizer="row_adagrad")
    dense_params = {k: params[k] for k in ("bot", "top")}
    emb = params["emb"]

    rng = np.random.default_rng(0)
    b = 128
    losses = []
    for i in range(100):
        dense = jnp.asarray(rng.standard_normal((b, cfg.dense_dim)).astype(np.float32))
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
