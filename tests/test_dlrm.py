"""DLRM model tests: forward vs numpy oracle, end-to-end training on
synthetic data (the analog of `run.sh -br random`, SURVEY.md §7 step 3-4),
and learnability (loss decreases, AUC above chance on a learnable task)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import (
    DLRMConfig,
    MeshConfig,
    QueryConfig,
    ShardingPolicy,
    TableConfig,
    toy_config,
)
from pim_embedding_lookup_tpu.data.synthetic import (
    QueryGenerator,
    SyntheticDLRMBatches,
)
from pim_embedding_lookup_tpu.models import (
    DLRM,
    bce_loss,
    fit,
    make_eval_step,
    make_optimizer,
    make_train_step,
    roc_auc,
)
from pim_embedding_lookup_tpu.models.dlrm import _apply_mlp, interact_dot
from pim_embedding_lookup_tpu.parallel import make_mesh


def small_config(dim=8, tables=3):
    return DLRMConfig(
        dense_dim=4,
        mlp_bot=(16, dim),
        mlp_top=(8, 1),
        tables=tuple(
            TableConfig(num_rows=50 + 13 * i, dim=dim, name=f"t{i}")
            for i in range(tables)
        ),
    )


def numpy_forward(params, config, dense, idx, mask, layout):
    """Independent numpy re-implementation of the whole DLRM forward."""

    def mlp(layers, x, last_linear):
        for i, l in enumerate(layers):
            x = x @ np.asarray(l["w"]) + np.asarray(l["b"])
            if not (last_linear and i == len(layers) - 1):
                x = np.maximum(x, 0)
        return x

    bot = mlp(params["bot"], dense, last_linear=False)  # relu on last? see below
    # note: _apply_mlp relus every layer except the final *top* layer
    emb = np.asarray(params["emb"])
    t, b, l = idx.shape
    d = config.sparse_dim
    pooled = np.zeros((b, t, d), np.float32)
    for ti in range(t):
        g = idx[ti] + layout.row_offsets[ti]
        for bi in range(b):
            for li in range(l):
                if mask[ti, bi, li]:
                    pooled[bi, ti] += emb[g[bi, li]]
    z = np.concatenate([bot[:, None, :], pooled], axis=1)
    zz = np.einsum("bid,bjd->bij", z, z)
    nf = z.shape[1]
    li_, lj_ = np.tril_indices(nf, -1)
    zi = np.concatenate([bot, zz[:, li_, lj_]], axis=1)
    logits = mlp(params["top"], zi, last_linear=True)
    return logits[:, 0]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def test_forward_vs_numpy(mesh, rng):
    config = small_config()
    model = DLRM(config, mesh, ShardingPolicy.ROW)
    params = model.init(jax.random.PRNGKey(0))
    b, l = 16, 4
    dense = rng.standard_normal((b, config.dense_dim)).astype(np.float32)
    gen = QueryGenerator(config.tables, QueryConfig(b, l), seed=1, fixed_length=False)
    idx, mask = gen.next_query()  # [T, B*L]
    logits = np.asarray(
        model.apply(params, jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(mask))
    )
    host_params = jax.tree.map(np.asarray, params)
    t = len(config.tables)
    expected = numpy_forward(
        host_params, config, dense,
        idx.reshape(t, b, l), mask.reshape(t, b, l), model.collection.layout,
    )
    np.testing.assert_allclose(logits, expected, rtol=2e-4, atol=2e-4)


def test_forward_policies_agree(mesh, rng):
    """Same params -> same logits under every sharding policy."""
    config = small_config(dim=16)
    b, l = 8, 3
    dense = rng.standard_normal((b, config.dense_dim)).astype(np.float32)
    gen = QueryGenerator(config.tables, QueryConfig(b, l), seed=2)
    idx, mask = gen.next_query()
    host_tables = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in config.tables
    ]
    outs = {}
    base = None
    for pol in [
        ShardingPolicy.REPLICATE,
        ShardingPolicy.ROW,
        ShardingPolicy.COLUMN,
        ShardingPolicy.TABLE_WISE,
    ]:
        model = DLRM(config, mesh, pol)
        params = model.init(jax.random.PRNGKey(3))
        params["emb"] = model.collection.device_put_tables(host_tables)
        if base is None:
            base_params = jax.tree.map(np.asarray, {k: params[k] for k in ("bot", "top")})
        else:
            for k in ("bot", "top"):
                params[k] = jax.tree.map(jnp.asarray, base_params[k])
        out = np.asarray(
            model.apply(params, jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(mask))
        )
        outs[pol] = out
        if base is None:
            base = out
        np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-4)


def test_training_learns(mesh):
    """Synthetic *learnable* task: label depends on one hot table row.
    Loss must fall and AUC must beat chance — the functional analog of the
    reference's AUC-parity acceptance (SURVEY.md §4 item 3)."""
    config = small_config(dim=8, tables=2)
    model = DLRM(config, mesh, ShardingPolicy.ROW)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(lr=0.5)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer)

    rng = np.random.default_rng(0)
    b, l = 128, 1

    def make_batch():
        dense = rng.standard_normal((b, config.dense_dim)).astype(np.float32)
        idx = np.stack(
            [rng.integers(0, t.num_rows, size=(b, l)) for t in config.tables]
        ).astype(np.int32)
        nt = len(config.tables)
        mask = np.ones((nt, b * l), bool)
        # learnable signal: label = whether table0's first index is even
        labels = (idx[0, :, 0] % 2 == 0).astype(np.float32)
        return dense, idx.reshape(nt, b * l), mask, labels

    losses = []
    for _ in range(150):
        dense, idx, mask, labels = make_batch()
        params, opt_state, loss, logits = train_step(
            params, opt_state,
            jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(mask),
            jnp.asarray(labels),
        )
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.05

    eval_step = make_eval_step(model)
    dense, idx, mask, labels = make_batch()
    probs = np.asarray(eval_step(params, jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(mask)))
    assert roc_auc(probs, labels) > 0.8


def test_fit_reports(mesh):
    config = small_config(dim=8, tables=2)
    model = DLRM(config, mesh, ShardingPolicy.REPLICATE)
    params = model.init(jax.random.PRNGKey(1))
    batches = list(
        SyntheticDLRMBatches(config, batch_size=32, indices_per_lookup=3, num_batches=8)
    )
    batches = [tuple(jnp.asarray(x) for x in bt) for bt in batches]
    params, reports = fit(
        model, params, iter(batches), lr=0.05, test_freq=4, test_batches=batches[:2]
    )
    assert len(reports) == 2
    assert all(np.isfinite(r.loss) for r in reports)
    assert all(0 <= r.accuracy <= 1 for r in reports)


def test_roc_auc_known():
    probs = np.array([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
    labels = np.array([1, 1, 0, 1, 0, 0], np.float32)
    # pairs: pos{0.9,0.8,0.3} neg{0.7,0.2,0.1}: correct pairs = 8/9
    assert abs(roc_auc(probs, labels) - 8 / 9) < 1e-9
    # ties average to 0.5
    assert abs(roc_auc(np.ones(4), np.array([1, 0, 1, 0], np.float32)) - 0.5) < 1e-9


def test_bce_matches_numpy():
    logits = jnp.asarray([-2.0, 0.0, 3.0])
    labels = jnp.asarray([0.0, 1.0, 1.0])
    x, y = np.asarray(logits), np.asarray(labels)
    expected = np.mean(np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x))))
    assert abs(float(bce_loss(logits, labels)) - expected) < 1e-6
