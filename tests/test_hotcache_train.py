"""Hot-cache lifecycle in TRAINING (VERDICT r1 item 10): the replicated
hot-row snapshot rides the routed train step as jit arguments, and the
driver refreshes it from the live table every K steps so staleness is
bounded.  Rebuild-every-step must be EXACTLY equivalent to uncached routed
training (fresh cache rows == shard rows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import (
    DLRMConfig, MeshConfig, ShardingPolicy, TableConfig,
)
from pim_embedding_lookup_tpu.models import DLRM
from pim_embedding_lookup_tpu.models.sparse_train import (
    make_sparse_train_state,
    make_sparse_train_step,
)
from pim_embedding_lookup_tpu.parallel import make_mesh
from pim_embedding_lookup_tpu.parallel.hotcache import (
    build_hot_cache,
    hot_ids_from_sample,
)

CFG = DLRMConfig(
    dense_dim=4,
    mlp_bot=(8, 8),
    mlp_top=(8, 1),
    tables=(
        TableConfig(num_rows=64, dim=8, name="small"),
        TableConfig(num_rows=9000, dim=8, name="big_a"),
        TableConfig(num_rows=20000, dim=8, name="big_b"),
    ),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def _batch(rng, b=16, l=2):
    t = len(CFG.tables)
    dense = rng.random((b, CFG.dense_dim), dtype=np.float32)
    idx = np.stack([
        np.minimum(rng.zipf(1.3, size=b * l) - 1, tb.num_rows - 1)
        for tb in CFG.tables
    ]).astype(np.int32)
    mask = np.ones((t, b * l), bool)
    labels = (rng.random(b) < 0.5).astype(np.float32)
    return (jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(mask),
            jnp.asarray(labels), idx)


def _setup(mesh, *, hot_cache, mxu_threshold=8192):
    model = DLRM(CFG, mesh, ShardingPolicy.ROW_HASH, hybrid=True)
    params = model.init(jax.random.PRNGKey(0))
    dense_opt, opt_state, acc = make_sparse_train_state(
        model, params, optimizer="row_adagrad", lr=0.05
    )
    step = make_sparse_train_step(
        model, dense_opt, lr=0.05, optimizer="row_adagrad",
        routed=True, hot_cache=hot_cache,
    )
    dense_params = {k: params[k] for k in ("bot", "top")}
    return model, params["emb"], acc, dense_params, opt_state, step


def test_hot_cache_train_rebuild_parity(mesh):
    """Rebuilding the cache from the live table before EVERY step makes
    cached routed training bitwise-equal to uncached routed training."""
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]

    model, emb_a, acc_a, dp_a, os_a, step_plain = _setup(mesh, hot_cache=False)
    _, emb_b, acc_b, dp_b, os_b, step_hot = _setup(mesh, hot_cache=True)

    coll = model.collection
    sel = list(coll.big_ids)
    sample = np.concatenate([b[4][sel] for b in batches], axis=1)
    hot_ids = hot_ids_from_sample(coll.big, sample, k=16)

    for dense, idx, mask, labels, _ in batches:
        emb_a, acc_a, dp_a, os_a, loss_a = step_plain(
            emb_a, acc_a, dp_a, os_a, dense, idx, mask, labels
        )
        hc = build_hot_cache(coll.big, emb_b["big"], hot_ids)
        emb_b, acc_b, dp_b, os_b, loss_b = step_hot(
            emb_b, acc_b, dp_b, os_b, dense, idx, mask, labels, *hc
        )
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    np.testing.assert_allclose(
        np.asarray(emb_a["big"]), np.asarray(emb_b["big"]), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(emb_a["small"]), np.asarray(emb_b["small"]),
        rtol=1e-6, atol=1e-7,
    )


def test_hot_cache_train_stale_still_updates_table(mesh):
    """Without rebuilds the FORWARD sees snapshot rows (bounded staleness),
    but optimizer updates always land in the true sharded table — the
    cached rows drift from the table by exactly the applied updates."""
    rng = np.random.default_rng(1)
    batches = [_batch(rng) for _ in range(2)]
    model, emb, acc, dp, os_, step_hot = _setup(mesh, hot_cache=True)
    coll = model.collection
    sample = np.concatenate([b[4][list(coll.big_ids)] for b in batches], axis=1)
    hot_ids = hot_ids_from_sample(coll.big, sample, k=16)
    hc = build_hot_cache(coll.big, emb["big"], hot_ids)
    before = np.asarray(hc[1]).copy()

    for dense, idx, mask, labels, _ in batches:
        emb, acc, dp, os_, loss = step_hot(
            emb, acc, dp, os_, dense, idx, mask, labels, *hc
        )
        assert np.isfinite(float(loss))

    # the table moved under the (unchanged) snapshot...
    fresh = build_hot_cache(coll.big, emb["big"], hot_ids)
    assert not np.allclose(np.asarray(fresh[1]), before)
    # ...and one rebuild fully resynchronizes the replica
    again = build_hot_cache(coll.big, emb["big"], hot_ids)
    np.testing.assert_array_equal(np.asarray(fresh[1]), np.asarray(again[1]))


def test_step_arg_contract(mesh):
    rng = np.random.default_rng(2)
    dense, idx, mask, labels, _ = _batch(rng)
    _, emb, acc, dp, os_, step_hot = _setup(mesh, hot_cache=True)
    with pytest.raises(TypeError, match="hot_cache"):
        step_hot(emb, acc, dp, os_, dense, idx, mask, labels)
    with pytest.raises(ValueError, match="routed"):
        make_sparse_train_step(
            DLRM(CFG, mesh, ShardingPolicy.ROW_HASH, hybrid=True),
            None, routed=False, hot_cache=True,
        )
