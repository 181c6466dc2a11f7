"""Train f32 -> quantize -> serve int8 (models/quantize.py): the production
capacity-serving cycle.  The reference quantizes at load because its DPU
path is inference-only (emb_host.h:207-212); here training stays float and
the export quantizes — predictions must agree within symmetric-int8 error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import (
    DLRMConfig, MeshConfig, ShardingPolicy, TableConfig,
)
from pim_embedding_lookup_tpu.models import DLRM, quantize_dlrm_embeddings
from pim_embedding_lookup_tpu.parallel import make_mesh

CFG = DLRMConfig(
    dense_dim=4,
    mlp_bot=(8, 16),
    mlp_top=(8, 1),
    tables=(
        TableConfig(num_rows=60, dim=16, name="s"),
        TableConfig(num_rows=20_000, dim=16, name="b"),
        TableConfig(num_rows=300, dim=16, name="m"),
    ),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


@pytest.mark.parametrize("hybrid", [False, True])
def test_quantized_serving_parity(mesh, hybrid):
    model = DLRM(CFG, mesh, ShardingPolicy.ROW_HASH, hybrid=hybrid)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, l = 16, 2
    dense = jnp.asarray(rng.standard_normal((b, 4)).astype(np.float32))
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.num_rows, size=b * l) for t in CFG.tables]
    ).astype(np.int32))
    mask = jnp.ones((len(CFG.tables), b * l), bool)

    f32_logits = model.apply(params, dense, idx, mask)

    scoll, sparams = quantize_dlrm_embeddings(model, params)
    if hybrid:
        assert sparams["emb"]["big"]["q"].dtype == jnp.int8
        # MXU small set stays exact
        np.testing.assert_array_equal(
            np.asarray(sparams["emb"]["small"]),
            np.asarray(params["emb"]["small"]),
        )
    else:
        assert sparams["emb"]["q"].dtype == jnp.int8
    pooled = scoll.lookup(sparams["emb"], idx, mask, batch_size=b)
    q_logits = model.apply_from_pooled(sparams, dense, pooled)
    # int8 symmetric quantization error propagated through tiny MLPs
    np.testing.assert_allclose(
        np.asarray(q_logits), np.asarray(f32_logits), atol=0.05
    )
    # idempotent on an already-quantized hybrid
    if hybrid:
        scoll2, sparams2 = quantize_dlrm_embeddings(
            type("M", (), {"collection": scoll})(), sparams
        )
        assert scoll2 is scoll and sparams2["emb"] is sparams["emb"]


def test_scale_mode_accuracy_auc(mesh):
    """Quantify the per-table-vs-per-row scale accuracy delta (VERDICT r4
    item 1) on a trained model: train f32 on a planted CTR task, quantize
    both ways, require both serving AUCs within 0.01 of f32 AUC.  (On
    trained tables per-row scales adapt to row-magnitude spread; the test
    pins that the cheaper per-table fold does not cost model quality at
    DLRM scale-spreads.)"""
    from pim_embedding_lookup_tpu.models import (
        make_optimizer, make_train_step, roc_auc,
    )

    rng = np.random.default_rng(5)
    n, b, steps = 4096, 64, 600
    tbl_rows = [t.num_rows for t in CFG.tables]
    row_logits = [rng.normal(0, 1.5, size=r) for r in tbl_rows]
    dense_np = rng.normal(0, 1, size=(n, 4)).astype(np.float32)
    # draw big-table ids from a small support so rows repeat enough to
    # train (and develop the row-magnitude spread per-row scales adapt to)
    idx_np = np.stack(
        [rng.integers(0, min(r, 500), size=n) for r in tbl_rows]
    ).astype(np.int32)
    logit = sum(row_logits[k][idx_np[k]] for k in range(3)) + 0.5 * dense_np[:, 0]
    y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.float32)

    model = DLRM(CFG, mesh, ShardingPolicy.ROW_HASH, hybrid=True)
    params = model.init(jax.random.PRNGKey(1))
    opt = make_optimizer(lr=0.1)
    step = make_train_step(model, opt)
    ost = opt.init(params)
    mask = jnp.ones((3, b), bool)
    for s in range(steps):
        sel = np.arange((s * b) % n, (s * b) % n + b) % n
        params, ost, _, _ = step(
            params, ost,
            jnp.asarray(dense_np[sel]), jnp.asarray(idx_np[:, sel]),
            mask, jnp.asarray(y[sel]),
        )

    full_mask = jnp.ones((3, n), bool)
    f32_logits = np.asarray(model.apply(
        params, jnp.asarray(dense_np), jnp.asarray(idx_np), full_mask
    ))
    auc_f32 = roc_auc(y, 1 / (1 + np.exp(-f32_logits)))

    aucs = {}
    for mode in ("row", "table"):
        scoll, sparams = quantize_dlrm_embeddings(
            model, params, scale_mode=mode
        )
        pooled = scoll.lookup(
            sparams["emb"], jnp.asarray(idx_np), full_mask, batch_size=n
        )
        ql = np.asarray(model.apply_from_pooled(
            sparams, jnp.asarray(dense_np), pooled
        ))
        aucs[mode] = roc_auc(y, 1 / (1 + np.exp(-ql)))

    print(f"\nAUC f32={auc_f32:.4f} int8-row={aucs['row']:.4f} "
          f"int8-table={aucs['table']:.4f}")
    assert abs(aucs["row"] - auc_f32) < 0.01, (aucs, auc_f32)
    assert abs(aucs["table"] - auc_f32) < 0.01, (aucs, auc_f32)


def test_unfuse_roundtrip(mesh):
    """unfuse_host inverts fused_host_array for packed ROW_HASH storage."""
    from pim_embedding_lookup_tpu.parallel import EmbeddingCollection

    rng = np.random.default_rng(1)
    tables = CFG.tables
    coll = EmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.fused_host_array(tables_np)
    back = coll.unfuse_host(fused)
    for a, b_ in zip(tables_np, back):
        np.testing.assert_array_equal(a, b_)
