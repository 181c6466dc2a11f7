"""Seeded fuzz over the full query-surface matrix: random (policy, packed,
storage, combiner, wire form, routed) combinations against one numpy
oracle.  The per-feature tests pin each axis; this guards the CROSS
products nobody thought to write a dedicated test for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.ops.ragged import shard_csr
from pim_embedding_lookup_tpu.parallel import (
    EmbeddingCollection,
    QuantizedEmbeddingCollection,
    make_mesh,
)

ROWISH = [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE]
ALL_POLICIES = ROWISH + [ShardingPolicy.REPLICATE, ShardingPolicy.COLUMN]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def oracle_csr(tables_np, bags, combiner):
    b, t = len(bags[0]), len(bags)
    out = np.zeros((b, t, tables_np[0].shape[1]), np.float32)
    for ti in range(t):
        for bi in range(b):
            ids = bags[ti][bi]
            if not ids:
                continue
            rows = tables_np[ti][ids]
            out[bi, ti] = {
                "sum": rows.sum(0), "mean": rows.mean(0), "max": rows.max(0)
            }[combiner]
    return out


def quant_roundtrip(tables_np, scale_mode):
    out = []
    for t in tables_np:
        if scale_mode == "table":
            am = np.abs(t).max()
            scale = np.full(t.shape[0], am / 127.0 if am > 0 else 1.0,
                            np.float32)
        else:
            absmax = np.abs(t).max(axis=1)
            scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(t / scale[:, None]), -127, 127).astype(np.int8)
        out.append(q.astype(np.float32) * scale[:, None])
    return out


@pytest.mark.parametrize("case", range(12))
def test_query_surface_fuzz(mesh, case):
    rng = np.random.default_rng(1000 + case)
    t = int(rng.integers(2, 5))
    dim = int(rng.choice([8, 16, 32]))
    tables = tuple(
        TableConfig(
            num_rows=int(rng.integers(16, 3000)), dim=dim, name=f"t{i}"
        )
        for i in range(t)
    )
    int8 = bool(rng.random() < 0.4)
    packed = bool(rng.random() < 0.5)
    policy = (
        ALL_POLICIES[int(rng.integers(len(ALL_POLICIES)))]
        if not int8
        else ROWISH[int(rng.integers(len(ROWISH)))]
    )
    routed = bool(rng.random() < 0.5) and policy in ROWISH
    combiner = ["sum", "mean", "max"][int(rng.integers(3))]
    if routed and combiner == "max":
        combiner = "mean"
    data_sharded = bool(rng.random() < 0.5)
    b = int(rng.choice([8, 16]))

    tables_np = [
        rng.standard_normal((tb.num_rows, tb.dim)).astype(np.float32)
        for tb in tables
    ]
    if int8:
        scale_mode = "table" if rng.random() < 0.5 else "row"
        coll = QuantizedEmbeddingCollection.create(
            tables, mesh, policy, packed=packed, scale_mode=scale_mode
        )
        params = coll.quantize_tables(tables_np)
        oracle_tables = quant_roundtrip(tables_np, scale_mode)
        rtol = atol = 2e-3
    else:
        coll = EmbeddingCollection.create(tables, mesh, policy, packed=packed)
        params = coll.device_put_tables(tables_np)
        oracle_tables = tables_np
        rtol = atol = 1e-4

    max_len = int(rng.integers(2, 7))
    bags = [
        [
            rng.integers(0, tb.num_rows, size=rng.integers(0, max_len))
            .astype(int).tolist()
            for _ in range(b)
        ]
        for tb in tables
    ]
    nd = mesh.shape["data"] if data_sharded else 1
    idx, off = shard_csr(bags, nd, max_len * (b // nd))
    kwargs = dict(combiner=combiner, data_sharded=data_sharded)
    if routed:
        out, dropped = coll.lookup_csr(
            params, jnp.asarray(idx), jnp.asarray(off),
            routed=True, return_stats=True, **kwargs,
        )
        assert int(dropped) == 0, f"case {case}: unexpected drops"
    else:
        out = coll.lookup_csr(
            params, jnp.asarray(idx), jnp.asarray(off), **kwargs
        )
    want = oracle_csr(oracle_tables, bags, combiner)
    np.testing.assert_allclose(
        np.asarray(out), want, rtol=rtol, atol=atol,
        err_msg=(
            f"case {case}: policy={policy} int8={int8} packed={packed} "
            f"routed={routed} combiner={combiner} ds={data_sharded}"
        ),
    )
