"""Lane-packed storage (FusedLayout.pack): dim<128 tables store pack=128/dim
fused rows per 128-lane storage row so each HBM gather issue fetches a full
128-lane row — the TPU analog of the DPU kernel's 8-byte read-pair trick
(emb_dpu_lookup.c:112-114: aligned 8B MRAM read, select with ind%2).

Parity is checked against the unpacked path and the numpy oracle across all
supported sharding policies, for lookup (dense + CSR), init, and the sparse
scatter-update optimizer step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.parallel import EmbeddingCollection, make_mesh, plan
from pim_embedding_lookup_tpu.parallel.planner import resolve_pack
from pim_embedding_lookup_tpu.parallel.sparse_update import (
    init_accumulator,
    sparse_update,
)

TABLES16 = (
    TableConfig(num_rows=100, dim=16, name="a"),
    TableConfig(num_rows=1000, dim=16, name="b"),
    TableConfig(num_rows=37, dim=16, name="c"),
    TableConfig(num_rows=4000, dim=16, name="d"),
)


def make_tables(dim):
    return tuple(
        TableConfig(num_rows=n, dim=dim, name=f"t{i}")
        for i, n in enumerate((100, 1000, 37, 4000))
    )


def make_query(rng, tables, b, l):
    idx = np.stack(
        [rng.integers(0, t.num_rows, size=(b, l)) for t in tables]
    ).astype(np.int32)
    mask = rng.random((len(tables), b, l)) < 0.7
    t = len(tables)
    return (
        jnp.asarray(idx.reshape(t, b * l)),
        jnp.asarray(mask.reshape(t, b * l)),
        idx,
        mask,
    )


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


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def test_resolve_pack():
    assert resolve_pack(16, ShardingPolicy.ROW, "auto") == 8
    assert resolve_pack(32, ShardingPolicy.ROW, "auto") == 4
    assert resolve_pack(64, ShardingPolicy.REPLICATE, True) == 2
    assert resolve_pack(128, ShardingPolicy.ROW, "auto") == 1
    assert resolve_pack(48, ShardingPolicy.ROW, "auto") == 1  # 128 % 48 != 0
    assert resolve_pack(16, ShardingPolicy.COLUMN, "auto") == 1
    assert resolve_pack(16, ShardingPolicy.ROW, False) == 1
    with pytest.raises(ValueError):
        resolve_pack(128, ShardingPolicy.ROW, True)
    with pytest.raises(ValueError):
        resolve_pack(16, ShardingPolicy.COLUMN, True)


def test_plan_packed_alignment():
    lay = plan(TABLES16, num_shards=4, policy=ShardingPolicy.ROW, packed=True)
    assert lay.pack == 8
    assert lay.storage_width == 128
    assert lay.rows_per_shard % (8 * lay.pack) == 0
    assert lay.storage_rows * lay.pack == lay.total_rows
    lay = plan(TABLES16, 4, ShardingPolicy.TABLE_WISE, packed=True)
    assert lay.pack == 8 and lay.rows_per_shard % (8 * lay.pack) == 0


@pytest.mark.parametrize(
    "policy",
    [
        ShardingPolicy.REPLICATE,
        ShardingPolicy.ROW,
        ShardingPolicy.ROW_HASH,
        ShardingPolicy.TABLE_WISE,
    ],
)
@pytest.mark.parametrize("dim", [16, 64])
def test_packed_lookup_parity(mesh, rng, policy, dim):
    tables = make_tables(dim)
    coll = EmbeddingCollection.create(tables, mesh, policy, packed=True)
    assert coll.layout.pack == 128 // dim
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    assert fused.shape == (coll.layout.storage_rows, 128)
    idx, mask, idx3, mask3 = make_query(rng, tables, b=16, l=5)
    out = coll.lookup(fused, idx, mask, batch_size=16)
    expected = oracle_pooled(tables_np, idx3, mask3)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_packed_csr_lookup_parity(mesh, rng):
    tables = TABLES16
    coll = EmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    t, b, cap = len(tables), 8, 40
    # ragged bags: random offsets per table
    offsets = np.zeros((t, b + 1), np.int32)
    indices = np.zeros((t, cap), np.int32)
    expected = np.zeros((b, t, 16), np.float32)
    for ti in range(t):
        lens = rng.integers(0, 6, size=b)
        lens = np.minimum(lens, cap // b)
        offsets[ti, 1:] = np.cumsum(lens)
        for bi in range(b):
            ids = rng.integers(0, tables[ti].num_rows, size=lens[bi])
            indices[ti, offsets[ti, bi] : offsets[ti, bi + 1]] = ids
            expected[bi, ti] = tables_np[ti][ids].sum(0) if len(ids) else 0
    out = coll.lookup_csr(fused, jnp.asarray(indices), jnp.asarray(offsets))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_packed_init_scales(mesh):
    coll = EmbeddingCollection.create(
        TABLES16, mesh, ShardingPolicy.ROW, packed=True
    )
    fused = coll.init(jax.random.PRNGKey(0))
    lo = coll.layout
    arr = np.asarray(fused).reshape(lo.total_rows, lo.dim)  # unpack
    for off, rows, t in zip(lo.row_offsets, lo.table_rows, TABLES16):
        bound = 1.0 / np.sqrt(t.num_rows)
        seg = arr[off : off + rows]
        assert np.abs(seg).max() <= bound + 1e-6
        assert np.abs(seg).std() > 0


@pytest.mark.parametrize("optimizer", ["sgd", "row_adagrad"])
@pytest.mark.parametrize(
    "policy",
    [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.REPLICATE],
)
def test_packed_sparse_update_parity(mesh, rng, policy, optimizer):
    """Packed and unpacked collections apply identical optimizer steps."""
    tables = TABLES16
    packed = EmbeddingCollection.create(tables, mesh, policy, packed=True)
    plain = EmbeddingCollection.create(tables, mesh, policy, packed=False)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    f_packed = packed.device_put_tables(tables_np)
    f_plain = plain.device_put_tables(tables_np)
    a_packed = init_accumulator(packed)
    a_plain = init_accumulator(plain)
    idx, mask, _, _ = make_query(rng, tables, b=8, l=4)
    g_pooled = jnp.asarray(
        rng.standard_normal((8, len(tables), 16)).astype(np.float32)
    )
    f_packed, a_packed = sparse_update(
        packed, f_packed, a_packed, idx, mask, g_pooled,
        lr=0.1, optimizer=optimizer,
    )
    f_plain, a_plain = sparse_update(
        plain, f_plain, a_plain, idx, mask, g_pooled,
        lr=0.1, optimizer=optimizer,
    )
    def to_fused_order(coll_, arr):
        arr = np.asarray(arr).reshape(coll_.layout.total_rows, 16)
        if coll_.layout.policy == ShardingPolicy.ROW_HASH:
            m, rps = coll_.layout.num_shards, coll_.layout.rows_per_shard
            perm = (
                np.arange(rps)[None, :] * m + np.arange(m)[:, None]
            ).reshape(-1)
            out = np.empty_like(arr)
            out[perm] = arr  # position s*rps+j holds fused row j*m+s
            return out
        return arr

    up = to_fused_order(packed, f_packed)
    pl = to_fused_order(plain, f_plain)
    # padded-tail rows may differ (different total padding); compare the
    # logical table regions
    for off_p, off_u, rows in zip(
        packed.layout.row_offsets, plain.layout.row_offsets,
        packed.layout.table_rows,
    ):
        np.testing.assert_allclose(
            up[off_p : off_p + rows], pl[off_u : off_u + rows],
            rtol=1e-5, atol=1e-6,
        )


def test_hybrid_packed_end_to_end(mesh, rng):
    """Hybrid with a packed big path trains and matches the unpacked hybrid
    lookup bit-for-bit after device_put of identical weights."""
    from pim_embedding_lookup_tpu.parallel.hybrid import HybridEmbeddingCollection

    tables = (
        TableConfig(num_rows=50, dim=16, name="s0"),
        TableConfig(num_rows=20000, dim=16, name="b0"),
        TableConfig(num_rows=9000, dim=16, name="b1"),
    )
    hp = HybridEmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW, mxu_threshold=1000, packed=True
    )
    hu = HybridEmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW, mxu_threshold=1000, packed=False
    )
    assert hp.big.layout.pack == 8 and hu.big.layout.pack == 1
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    pp = hp.device_put_tables(tables_np)
    pu = hu.device_put_tables(tables_np)
    idx, mask, idx3, mask3 = make_query(rng, tables, b=8, l=3)
    op = hp.lookup(pp, idx, mask, batch_size=8)
    ou = hu.lookup(pu, idx, mask, batch_size=8)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ou), rtol=1e-5, atol=1e-6)
    # vs oracle: the hybrid MXU path quantizes small-table weights to bf16
    # (~0.4%/element, amplified by bag-sum cancellation) — identical in both
    # collections, so the tight packed-vs-unpacked check above is the real
    # parity gate.
    np.testing.assert_allclose(
        np.asarray(op), oracle_pooled(tables_np, idx3, mask3), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("optimizer", ["sgd", "row_adagrad"])
def test_hybrid_mxu_small_update_parity(mesh, rng, optimizer):
    """The hybrid small-set MXU update (onehot^T matmul densified grads)
    matches the entry-wise scatter path to bf16 matmul precision."""
    from pim_embedding_lookup_tpu.parallel.hybrid import (
        HybridEmbeddingCollection,
        init_accumulator_hybrid,
        sparse_update_hybrid,
    )

    tables = (
        TableConfig(num_rows=50, dim=16, name="s0"),
        TableConfig(num_rows=300, dim=16, name="s1"),
        TableConfig(num_rows=20000, dim=16, name="b0"),
    )
    hyb = HybridEmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW, mxu_threshold=1000
    )
    plain = EmbeddingCollection.create(tables, mesh, ShardingPolicy.REPLICATE)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    ph = hyb.device_put_tables(tables_np)
    pf = plain.device_put_tables(tables_np)
    ah = init_accumulator_hybrid(hyb)
    af = init_accumulator(plain)
    idx, mask, _, _ = make_query(rng, tables, b=8, l=4)
    g_pooled = jnp.asarray(
        rng.standard_normal((8, len(tables), 16)).astype(np.float32)
    )
    ph, ah = sparse_update_hybrid(
        hyb, ph, ah, idx, mask, g_pooled, lr=0.1, optimizer=optimizer
    )
    pf, af = sparse_update(
        plain, pf, af, idx, mask, g_pooled, lr=0.1, optimizer=optimizer
    )
    got = np.asarray(ph["small"])
    want = np.asarray(pf)
    for t_hyb, t_orig in enumerate(hyb.small_ids):
        off_h = hyb.small.layout.row_offsets[t_hyb]
        rows = hyb.small.layout.table_rows[t_hyb]
        off_p = plain.layout.row_offsets[t_orig]
        np.testing.assert_allclose(
            got[off_h : off_h + rows],
            want[off_p : off_p + rows],
            rtol=2e-2, atol=2e-2,  # bf16 matmul operands
        )


@pytest.mark.parametrize("policy", [ShardingPolicy.ROW, ShardingPolicy.REPLICATE])
def test_chunked_pooled_lookup_parity(mesh, rng, policy, monkeypatch):
    """Force the bag-chunked scan path (big multi-hot intermediates OOM
    without it) and check parity against the oracle."""
    import pim_embedding_lookup_tpu.parallel.collection as cmod

    monkeypatch.setattr(cmod, "_POOL_CHUNK_BYTES", 4096)  # force chunking
    tables = TABLES16
    coll = EmbeddingCollection.create(tables, mesh, policy, packed=True)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    idx, mask, idx3, mask3 = make_query(rng, tables, b=16, l=5)
    assert cmod._chunk_bags(5, 128 * 4, len(tables), 16 * 5) is not None
    out = coll.lookup(fused, idx, mask, batch_size=16)
    expected = oracle_pooled(tables_np, idx3, mask3)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize(
    "policy",
    [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH, ShardingPolicy.TABLE_WISE],
)
def test_routed_lookup_parity(mesh, rng, policy, packed):
    """All-to-all routed lookup == broadcast-and-mask lookup == oracle.

    Contiguous layouts (ROW/TABLE_WISE) put the small TABLES16 tables
    wholly on shard 0, so routing is maximally skewed — the API-default
    capacity factor (safe_capacity_factor = num_shards) must make drops
    impossible regardless (round-1 red-test regression)."""
    tables = TABLES16
    coll = EmbeddingCollection.create(tables, mesh, policy, packed=packed)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    idx, mask, idx3, mask3 = make_query(rng, tables, b=16, l=5)
    routed, dropped = coll.lookup_routed(
        fused, idx, mask, batch_size=16, return_stats=True
    )
    assert int(dropped) == 0
    broadcast = coll.lookup(fused, idx, mask, batch_size=16)
    expected = oracle_pooled(tables_np, idx3, mask3)
    np.testing.assert_allclose(
        np.asarray(routed), expected, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(broadcast), rtol=1e-5, atol=1e-6
    )


def test_routed_lookup_mean_combiner(mesh, rng):
    """lookup_routed(combiner="mean") == broadcast mean; max is rejected
    (additive psum merge cannot express it — use the broadcast path)."""
    coll = EmbeddingCollection.create(
        TABLES16, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES16
    ]
    fused = coll.device_put_tables(tables_np)
    idx, mask, _, _ = make_query(rng, TABLES16, b=8, l=5)
    routed = coll.lookup_routed(
        fused, idx, mask, batch_size=8, combiner="mean"
    )
    broadcast = coll.lookup(fused, idx, mask, batch_size=8, combiner="mean")
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(broadcast), rtol=1e-5, atol=1e-6
    )
    with pytest.raises(ValueError):
        coll.lookup_routed(fused, idx, mask, batch_size=8, combiner="max")


def test_routed_lookup_rejects_unsupported_policy(mesh, rng):
    coll = EmbeddingCollection.create(
        TABLES16, mesh, ShardingPolicy.REPLICATE
    )
    fused = coll.init(jax.random.PRNGKey(0))
    idx, mask, _, _ = make_query(rng, TABLES16, b=8, l=2)
    with pytest.raises(ValueError):
        coll.lookup_routed(fused, idx, mask, batch_size=8)



@pytest.mark.parametrize("packed", [False, True])
def test_row_hash_init_scales(mesh, packed):
    coll = EmbeddingCollection.create(
        TABLES16, mesh, ShardingPolicy.ROW_HASH, packed=packed
    )
    fused = coll.init(jax.random.PRNGKey(0))
    lo = coll.layout
    m, rps = lo.num_shards, lo.rows_per_shard
    arr = np.asarray(fused).reshape(lo.total_rows, lo.dim)
    # invert the strided placement: position s*rps + j holds fused j*m + s
    perm = (np.arange(rps)[None, :] * m + np.arange(m)[:, None]).reshape(-1)
    unstrided = np.empty_like(arr)
    unstrided[perm] = arr
    for off, rows, t in zip(lo.row_offsets, lo.table_rows, TABLES16):
        bound = 1.0 / np.sqrt(t.num_rows)
        seg = unstrided[off : off + rows]
        assert np.abs(seg).max() <= bound + 1e-6
        assert np.abs(seg).std() > 0


def test_row_hash_csr_parity(mesh, rng):
    tables = TABLES16
    coll = EmbeddingCollection.create(
        tables, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    t, b, cap = len(tables), 8, 40
    offsets = np.zeros((t, b + 1), np.int32)
    indices = np.zeros((t, cap), np.int32)
    expected = np.zeros((b, t, 16), np.float32)
    for ti in range(t):
        lens = np.minimum(rng.integers(0, 6, size=b), cap // b)
        offsets[ti, 1:] = np.cumsum(lens)
        for bi in range(b):
            ids = rng.integers(0, tables[ti].num_rows, size=lens[bi])
            indices[ti, offsets[ti, bi] : offsets[ti, bi + 1]] = ids
            expected[bi, ti] = tables_np[ti][ids].sum(0) if len(ids) else 0
    out = coll.lookup_csr(fused, jnp.asarray(indices), jnp.asarray(offsets))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("optimizer", ["sgd", "row_adagrad"])
@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize(
    "policy", [ShardingPolicy.ROW, ShardingPolicy.ROW_HASH]
)
def test_routed_sparse_update_parity(mesh, rng, policy, packed, optimizer):
    """Routed (all-to-all (id, grad) pairs) == broadcast optimizer step."""
    tables = TABLES16
    ca = EmbeddingCollection.create(tables, mesh, policy, packed=packed)
    cb = EmbeddingCollection.create(tables, mesh, policy, packed=packed)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fa = ca.device_put_tables(tables_np)
    fb = cb.device_put_tables(tables_np)
    aa, ab = init_accumulator(ca), init_accumulator(cb)
    idx, mask, _, _ = make_query(rng, tables, b=8, l=4)
    g_pooled = jnp.asarray(
        rng.standard_normal((8, len(tables), 16)).astype(np.float32)
    )
    fa, aa, dropped = sparse_update(
        ca, fa, aa, idx, mask, g_pooled, lr=0.1, optimizer=optimizer,
        routed=True, return_stats=True,
    )
    assert int(dropped) == 0
    fb, ab = sparse_update(
        cb, fb, ab, idx, mask, g_pooled, lr=0.1, optimizer=optimizer,
    )
    np.testing.assert_allclose(
        np.asarray(fa), np.asarray(fb), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(aa), np.asarray(ab), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("combiner", ["mean", "max"])
@pytest.mark.parametrize(
    "policy",
    [ShardingPolicy.REPLICATE, ShardingPolicy.ROW, ShardingPolicy.ROW_HASH],
)
def test_collection_combiners(mesh, rng, policy, combiner):
    """MEAN/MAX pooling (torch-EmbeddingBag parity; reference is SUM-only,
    emb_dpu_lookup.c:114).  Empty bags pool to 0 like torch."""
    tables = TABLES16
    coll = EmbeddingCollection.create(tables, mesh, policy, packed=True)
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in tables
    ]
    fused = coll.device_put_tables(tables_np)
    idx, mask, idx3, mask3 = make_query(rng, tables, b=16, l=5)
    # force an empty bag
    mask3[0, 0, :] = False
    mask = jnp.asarray(mask3.reshape(len(tables), -1))
    out = np.asarray(
        coll.lookup(fused, idx, mask, batch_size=16, combiner=combiner)
    )
    t, b, l = idx3.shape
    expected = np.zeros((b, t, 16), np.float32)
    for ti in range(t):
        for bi in range(b):
            sel = [idx3[ti, bi, li] for li in range(l) if mask3[ti, bi, li]]
            if sel:
                rows = tables_np[ti][sel]
                expected[bi, ti] = (
                    rows.mean(0) if combiner == "mean" else rows.max(0)
                )
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)
