"""Sharded int8 collection: 4x capacity, f32 accumulation, inference-only.
Parity vs the f32 oracle within symmetric-quantization error (the analog
of the reference's /1e9 fixed-point decode tolerance, load_generator.c:58)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import (
    QuantizedEmbeddingCollection,
    make_mesh,
)

TABLES = (
    TableConfig(num_rows=100, dim=16, name="a"),
    TableConfig(num_rows=1000, dim=16, name="b"),
    TableConfig(num_rows=37, dim=16, name="c"),
    TableConfig(num_rows=4000, dim=16, name="d"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def oracle_pooled(tables_np, idx, mask):
    t, b, l = idx.shape
    d = tables_np[0].shape[1]
    out = np.zeros((b, t, d), np.float32)
    for ti in range(t):
        for bi in range(b):
            for li in range(l):
                if mask[ti, bi, li]:
                    out[bi, ti] += tables_np[ti][idx[ti, bi, li]]
    return out


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize(
    "policy",
    [
        ShardingPolicy.REPLICATE,
        ShardingPolicy.ROW,
        ShardingPolicy.ROW_HASH,
        ShardingPolicy.TABLE_WISE,
    ],
)
def test_quantized_lookup_parity(mesh, policy, packed):
    rng = np.random.default_rng(0)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, policy, packed=packed
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    assert params["q"].dtype == jnp.int8
    b, l = 16, 5
    idx = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    mask = rng.random((len(TABLES), b, l)) < 0.7
    out = coll.lookup(
        params,
        jnp.asarray(idx.reshape(len(TABLES), b * l)),
        jnp.asarray(mask.reshape(len(TABLES), b * l)),
        batch_size=b,
    )
    expected = oracle_pooled(tables_np, idx, mask)
    # symmetric int8: |err| <= absmax/254 per element, l entries per bag
    err = np.abs(np.asarray(out) - expected)
    bound = l * np.abs(np.stack([t.max() for t in tables_np])).max() / 254 * 1.5
    assert err.max() <= bound + 1e-5, (err.max(), bound)


@pytest.mark.parametrize("scale_mode", ["row", "table"])
def test_quantized_init_bounds(mesh, scale_mode):
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True,
        scale_mode=scale_mode,
    )
    params = coll.init(jax.random.PRNGKey(0))
    assert params["q"].shape == (coll.layout.storage_rows, 128)
    if scale_mode == "row":
        assert params["scale"].shape == (coll.layout.total_rows,)
        s = np.asarray(params["scale"])
    else:
        assert params["tscale"].shape == (len(TABLES),)
        s = np.asarray(params["tscale"])
    assert (s > 0).all() and s.max() <= 1.0 / 127 + 1e-9


def test_quantized_init_modes_identical(mesh):
    """At init all rows of a table share the analytic scale, so the "row"
    and "table" modes must produce numerically identical lookups."""
    rng = np.random.default_rng(3)
    b, l = 8, 3
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.num_rows, size=b * l) for t in TABLES]
    ).astype(np.int32))
    mask = jnp.ones((len(TABLES), b * l), bool)
    outs = []
    for mode in ("row", "table"):
        coll = QuantizedEmbeddingCollection.create(
            TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True,
            scale_mode=mode,
        )
        params = coll.init(jax.random.PRNGKey(7))
        outs.append(np.asarray(
            coll.lookup(params, idx, mask, batch_size=b)
        ))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)


def test_quantized_memory_footprint(mesh):
    """The capacity claim: int8 params are ~1/4 of f32 bytes."""
    coll = QuantizedEmbeddingCollection.create(TABLES, mesh, ShardingPolicy.ROW)
    lay = coll.layout
    int8_bytes = lay.total_rows * lay.dim + lay.total_rows * 4
    f32_bytes = lay.total_rows * lay.dim * 4
    assert int8_bytes < 0.4 * f32_bytes


def test_quantized_rejects_column(mesh):
    with pytest.raises(ValueError):
        QuantizedEmbeddingCollection.create(
            TABLES, mesh, ShardingPolicy.COLUMN
        )


# ---- r4: int8 as a FULL citizen of the query surface (VERDICT r3 item 2) --


def quantize_roundtrip_tables(tables_np, scale_mode="row"):
    """The f32 values the int8 storage actually represents — exact
    expectations (no quantization-error tolerance needed)."""
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


def make_bags(rng, tables, b, max_len=6, empty_rate=0.2):
    bags = []
    for t in tables:
        tb = []
        for _ in range(b):
            n = 0 if rng.random() < empty_rate else int(rng.integers(1, max_len))
            tb.append(list(rng.integers(0, t.num_rows, size=n)))
        bags.append(tb)
    return bags


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


@pytest.mark.parametrize("scale_mode", ["row", "table"])
@pytest.mark.parametrize("combiner", ["sum", "mean", "max"])
@pytest.mark.parametrize("data_sharded", [False, True])
def test_quantized_csr_combiners(mesh, combiner, data_sharded, scale_mode):
    """CSR bags (incl. empty) + the full combiner set on int8 storage —
    exact vs the dequantized-roundtrip oracle, in BOTH scale modes."""
    from pim_embedding_lookup_tpu.ops.ragged import shard_csr

    rng = np.random.default_rng(2)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True,
        scale_mode=scale_mode,
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    b = 16
    bags = make_bags(rng, TABLES, b)
    nd = mesh.shape["data"] if data_sharded else 1
    idx, off = shard_csr(bags, nd, 8 * (b // nd))
    out = coll.lookup_csr(
        params, jnp.asarray(idx), jnp.asarray(off),
        combiner=combiner, data_sharded=data_sharded,
    )
    want = oracle_csr(
        quantize_roundtrip_tables(tables_np, scale_mode), bags, combiner
    )
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("scale_mode", ["row", "table"])
@pytest.mark.parametrize("combiner", ["mean", "max"])
def test_quantized_dense_combiners(mesh, combiner, scale_mode):
    rng = np.random.default_rng(4)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW, scale_mode=scale_mode
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    rt = quantize_roundtrip_tables(tables_np, scale_mode)
    b, l = 12, 4
    idx = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in TABLES]
    ).astype(np.int32)
    mask = rng.random((len(TABLES), b, l)) < 0.7
    out = coll.lookup(
        params,
        jnp.asarray(idx.reshape(len(TABLES), b * l)),
        jnp.asarray(mask.reshape(len(TABLES), b * l)),
        batch_size=b, combiner=combiner,
    )
    expected = np.zeros((b, len(TABLES), 16), np.float32)
    for ti in range(len(TABLES)):
        for bi in range(b):
            ids = [idx[ti, bi, li] for li in range(l) if mask[ti, bi, li]]
            if not ids:
                continue
            rows = rt[ti][ids]
            expected[bi, ti] = rows.mean(0) if combiner == "mean" else rows.max(0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("scale_mode", ["row", "table"])
@pytest.mark.parametrize("policy", [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH])
def test_quantized_routed_parity(mesh, policy, scale_mode):
    """Routed int8 lookup (dense + CSR): zero drops at the default cf,
    parity vs the broadcast int8 path.  "row" mode dequantizes on the
    owner (f32 return wire); "table" mode rides raw codes back in bf16
    (exact) and folds the scale post-pool."""
    from pim_embedding_lookup_tpu.ops.ragged import shard_csr

    rng = np.random.default_rng(6)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, policy, packed=True, scale_mode=scale_mode
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    b, l = 16, 5
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.num_rows, size=b * l) for t in TABLES]
    ).astype(np.int32))
    mask = jnp.asarray(rng.random((len(TABLES), b * l)) < 0.8)

    got, dropped = coll.lookup_routed(
        params, idx, mask, batch_size=b, return_stats=True
    )
    assert int(dropped) == 0
    want = coll.lookup(params, idx, mask, batch_size=b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )

    bags = make_bags(rng, TABLES, b)
    cidx, coff = shard_csr(bags, 1, 8 * b)
    got_csr, csr_drops = coll.lookup_csr(
        params, jnp.asarray(cidx), jnp.asarray(coff),
        routed=True, return_stats=True,
    )
    assert int(csr_drops) == 0
    want_csr = coll.lookup_csr(params, jnp.asarray(cidx), jnp.asarray(coff))
    np.testing.assert_allclose(
        np.asarray(got_csr), np.asarray(want_csr), rtol=1e-5, atol=1e-6
    )


def test_hybrid_quantized_big(mesh):
    """MXU small set + int8 big set (the capacity pairing): dense + CSR +
    routed parity vs the all-f32 hybrid within quantization error; sparse
    update refused."""
    from pim_embedding_lookup_tpu.ops.ragged import shard_csr
    from pim_embedding_lookup_tpu.parallel.hybrid import (
        HybridEmbeddingCollection,
        init_accumulator_hybrid,
        sparse_update_hybrid,
    )

    tables = (
        TableConfig(num_rows=50, dim=16, name="tiny"),
        TableConfig(num_rows=40_000, dim=16, name="big1"),
        TableConfig(num_rows=300, dim=16, name="small"),
        TableConfig(num_rows=60_000, dim=16, name="big2"),
    )
    rng = np.random.default_rng(8)
    coll = HybridEmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000,
        quantized_big=True,
    )
    assert coll._big_quantized
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    params = coll.device_put_tables(tables_np)
    assert params["big"]["q"].dtype == jnp.int8

    b, l = 16, 3
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.num_rows, size=b * l) for t in tables]
    ).astype(np.int32))
    mask = jnp.asarray(rng.random((len(tables), b * l)) < 0.8)

    f32_coll = HybridEmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=1000
    )
    f32_params = f32_coll.device_put_tables(tables_np)
    want = f32_coll.lookup(f32_params, idx, mask, batch_size=b)
    got = coll.lookup(params, idx, mask, batch_size=b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.15)

    got_r, dropped = coll.lookup(
        params, idx, mask, batch_size=b, routed=True, return_stats=True
    )
    assert int(dropped) == 0
    np.testing.assert_allclose(
        np.asarray(got_r), np.asarray(got), rtol=1e-5, atol=1e-6
    )

    bags = make_bags(rng, tables, b)
    cidx, coff = shard_csr(bags, 1, 8 * b)
    csr = coll.lookup_csr(params, jnp.asarray(cidx), jnp.asarray(coff))
    csr_r, csr_drops = coll.lookup_csr(
        params, jnp.asarray(cidx), jnp.asarray(coff),
        routed=True, return_stats=True,
    )
    assert int(csr_drops) == 0
    np.testing.assert_allclose(
        np.asarray(csr_r), np.asarray(csr), rtol=1e-5, atol=1e-6
    )

    g = jnp.asarray(rng.standard_normal((b, len(tables), 16)).astype(np.float32))
    with pytest.raises(ValueError, match="inference-only"):
        sparse_update_hybrid(
            coll, params, init_accumulator_hybrid(f32_coll), idx, mask, g,
            lr=0.1,
        )


def test_quantized_checkpoint_roundtrip(mesh, tmp_path):
    """{"q","scale"} params round-trip through orbax with the layout
    fingerprint; a different-layout collection is refused (VERDICT r3
    item 2: checkpoint fingerprint test for the int8 mode)."""
    from pim_embedding_lookup_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(10)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    path = str(tmp_path / "q_ckpt")
    ckpt.save(path, params, meta=ckpt.collection_meta(coll))

    restored = ckpt.restore(
        path, params, expect_meta=ckpt.collection_meta(coll)
    )
    assert set(restored) == set(params)
    for k in params:  # {"q", "tscale"} (table mode) or {"q", "scale"}
        np.testing.assert_array_equal(
            np.asarray(restored[k]), np.asarray(params[k])
        )

    other = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW, packed=True
    )
    with pytest.raises(ValueError, match="layout mismatch"):
        ckpt.restore(
            path, other.quantize_tables(tables_np),
            expect_meta=ckpt.collection_meta(other),
        )


@pytest.mark.parametrize("scale_mode", ["row", "table"])
def test_quantized_hot_cache_routed(mesh, scale_mode):
    """build_hot_cache on int8 dict storage (r4 review finding): cache rows
    are in the same units as the gathered rows ("row": dequantized f32;
    "table": quantized units, scale folded post-pool), hits bypass the
    int8 gather, routed lookup parity holds with the cache installed."""
    from pim_embedding_lookup_tpu.parallel.hotcache import (
        build_hot_cache, hot_ids_from_sample,
    )

    rng = np.random.default_rng(12)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True,
        scale_mode=scale_mode,
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    b, l = 16, 4
    idx_np = np.stack(
        [
            np.minimum(rng.zipf(1.3, size=b * l) - 1, t.num_rows - 1)
            for t in TABLES
        ]
    ).astype(np.int32)
    idx = jnp.asarray(idx_np)
    mask = jnp.ones((len(TABLES), b * l), bool)

    hot_ids = hot_ids_from_sample(coll, idx_np, 32)
    cache = build_hot_cache(coll, params, hot_ids)
    assert cache[1].dtype == jnp.float32

    got, dropped = coll.lookup_routed(
        params, idx, mask, batch_size=b, hot_cache=cache, return_stats=True
    )
    assert int(dropped) == 0
    want = coll.lookup(params, idx, mask, batch_size=b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
