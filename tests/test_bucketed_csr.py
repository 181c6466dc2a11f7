"""Length-bucketed CSR dispatch (parallel/bucketed.py): ragged bags ride
fixed-L dense kernels + a residual CSR tail, merged by position scatter —
parity vs the plain lookup_csr path for every combiner, on plain / hybrid /
int8 collections.  (The reference's wire is CSR but its bags are padded to
a fixed L on the host, emb_host.h:30,262 — this is the shape-adaptive
version of that move.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.config import MeshConfig, ShardingPolicy, TableConfig
from pim_embedding_lookup_tpu.ops.ragged import (
    pack_length_buckets,
    plan_length_buckets,
    shard_csr,
)
from pim_embedding_lookup_tpu.parallel import (
    EmbeddingCollection,
    HybridEmbeddingCollection,
    QuantizedEmbeddingCollection,
    lookup_csr_bucketed,
    make_mesh,
)

TABLES = (
    TableConfig(num_rows=100, dim=16, name="a"),
    TableConfig(num_rows=3000, dim=16, name="b"),
    TableConfig(num_rows=37, dim=16, name="c"),
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, model=4))


def ragged_case(rng, b, max_len=12, empty_rate=0.15):
    """Bags spanning empties, short, and beyond-largest-bucket lengths."""
    bags = []
    for t in TABLES:
        tb = []
        for _ in range(b):
            r = rng.random()
            if r < empty_rate:
                n = 0
            elif r < 0.8:
                n = int(rng.integers(1, 5))
            else:
                n = int(rng.integers(5, max_len))  # beyond bucket_ls[-1]=4
            tb.append(list(rng.integers(0, t.num_rows, size=n)))
        bags.append(tb)
    return bags


def test_plan_and_pack_shapes():
    rng = np.random.default_rng(0)
    b = 32
    bags = ragged_case(rng, b)
    idx, off = shard_csr(bags, 1, 16 * b)
    plan = plan_length_buckets(off, bucket_ls=(1, 2, 4), slack=1.2)
    assert plan.batch == b and plan.tail_bags > 0
    packed = pack_length_buckets(idx, off, plan)
    for k, l in enumerate(plan.bucket_ls):
        assert packed.idx[k].shape == (len(TABLES), plan.capacities[k] * l)
        assert packed.pos[k].shape == (plan.capacities[k],)
    # every batch element with any entries occupies exactly one slot
    placed = []
    for k in range(len(plan.bucket_ls)):
        placed += [p for p in packed.pos[k] if p < b]
    placed += [p for p in packed.tail_pos if p < b]
    expect = [
        bi for bi in range(b)
        if any(len(bags[ti][bi]) > 0 for ti in range(len(TABLES)))
    ]
    assert sorted(placed) == sorted(expect)
    assert not packed.identity


def test_pack_overflow_raises():
    rng = np.random.default_rng(1)
    b = 16
    bags = [[list(rng.integers(0, t.num_rows, size=8)) for _ in range(b)]
            for t in TABLES]
    idx, off = shard_csr(bags, 1, 16 * b)
    plan = plan_length_buckets(off, bucket_ls=(1, 2), slack=1.0)
    # shrink the tail below what the batch needs
    import dataclasses
    bad = dataclasses.replace(plan, tail_bags=2, tail_entries=16)
    with pytest.raises(ValueError, match="overflow"):
        pack_length_buckets(idx, off, bad)


@pytest.mark.parametrize("combiner", ["sum", "mean", "max"])
def test_bucketed_parity_plain(mesh, combiner):
    rng = np.random.default_rng(2)
    coll = EmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b = 32
    bags = ragged_case(rng, b)
    idx, off = shard_csr(bags, 1, 16 * b)
    plan = plan_length_buckets(off, bucket_ls=(1, 2, 4), slack=1.2)
    packed = pack_length_buckets(idx, off, plan)
    got = lookup_csr_bucketed(coll, params, packed, combiner=combiner)
    want = coll.lookup_csr(
        params, jnp.asarray(idx), jnp.asarray(off), combiner=combiner
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("combiner", ["sum", "max"])
def test_bucketed_parity_hybrid(mesh, combiner):
    rng = np.random.default_rng(3)
    coll = HybridEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, mxu_threshold=500, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b = 24
    bags = ragged_case(rng, b)
    idx, off = shard_csr(bags, 1, 16 * b)
    plan = plan_length_buckets(off, bucket_ls=(1, 4), slack=1.5)
    packed = pack_length_buckets(idx, off, plan)
    got = lookup_csr_bucketed(coll, params, packed, combiner=combiner)
    want = coll.lookup_csr(
        params, jnp.asarray(idx), jnp.asarray(off), combiner=combiner
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("scale_mode", ["row", "table"])
def test_bucketed_parity_int8(mesh, scale_mode):
    rng = np.random.default_rng(4)
    coll = QuantizedEmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True,
        scale_mode=scale_mode,
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.quantize_tables(tables_np)
    b = 24
    bags = ragged_case(rng, b)
    idx, off = shard_csr(bags, 1, 16 * b)
    plan = plan_length_buckets(off, slack=1.2)
    packed = pack_length_buckets(idx, off, plan)
    got = lookup_csr_bucketed(coll, params, packed)
    want = coll.lookup_csr(params, jnp.asarray(idx), jnp.asarray(off))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_bucketed_single_hot_no_tail(mesh):
    """Fixed-L wire (the bench headline shape): everything lands in one
    bucket, no tail — the dispatch degenerates to the dense kernel + a
    position scatter."""
    rng = np.random.default_rng(5)
    coll = EmbeddingCollection.create(
        TABLES, mesh, ShardingPolicy.ROW_HASH, packed=True
    )
    tables_np = [
        rng.standard_normal((t.num_rows, t.dim)).astype(np.float32)
        for t in TABLES
    ]
    params = coll.device_put_tables(tables_np)
    b = 32
    bags = [
        [[int(rng.integers(0, t.num_rows))] for _ in range(b)] for t in TABLES
    ]
    idx, off = shard_csr(bags, 1, b)
    plan = plan_length_buckets(off, bucket_ls=(1,), slack=1.0)
    assert plan.tail_bags == 0 and plan.capacities == (b,)
    packed = pack_length_buckets(idx, off, plan)
    assert packed.identity  # merge is a free slice on the fixed-L wire
    got = lookup_csr_bucketed(coll, params, packed)
    want = coll.lookup_csr(params, jnp.asarray(idx), jnp.asarray(off))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_native_packer_parity():
    """Native threaded packer (feeder.cpp pel_pack_buckets) produces
    byte-identical BucketedCSR output to the numpy packer across random
    ragged batches — including spill, tail, empty bags, and the identity
    fast path.  Skips when the native lib isn't built."""
    from pim_embedding_lookup_tpu.utils import native

    if not native.available():
        pytest.skip("libpelfeeder.so not built (make -C native)")
    rng = np.random.default_rng(7)

    def compare(p1, p2):
        assert p1.identity == p2.identity
        for a, b2 in zip(p1.idx + p1.mask + p1.pos, p2.idx + p2.mask + p2.pos):
            np.testing.assert_array_equal(a, b2)
        for a, b2 in (
            (p1.tail_idx, p2.tail_idx),
            (p1.tail_off, p2.tail_off),
            (p1.tail_pos, p2.tail_pos),
        ):
            assert (a is None) == (b2 is None)
            if a is not None:
                np.testing.assert_array_equal(a, b2)

    for trial in range(12):
        b = int(rng.integers(4, 120))
        bags = ragged_case(rng, b)
        idx, off = shard_csr(bags, 1, 16 * b)
        plan = plan_length_buckets(
            off, bucket_ls=(1, 2, 4), slack=float(rng.uniform(1.0, 1.6))
        )
        pn = pack_length_buckets(idx, off, plan, impl="numpy")
        pc = pack_length_buckets(idx, off, plan, impl="native")
        compare(pn, pc)

    # identity case: fixed-L single-hot
    b = 64
    lens = np.ones((len(TABLES), b), np.int64)
    off = np.zeros((len(TABLES), b + 1), np.int64)
    np.cumsum(lens, axis=1, out=off[:, 1:])
    idx = np.stack(
        [rng.integers(0, t.num_rows, size=b) for t in TABLES]
    ).astype(np.int32)
    plan = plan_length_buckets(off, bucket_ls=(1, 2), slack=1.0)
    pn = pack_length_buckets(idx, off, plan, impl="numpy")
    pc = pack_length_buckets(idx, off, plan, impl="native")
    compare(pn, pc)
    assert pc.identity


def test_packer_misuse_errors():
    """Both packers reject a batch/plan mismatch; the native packer rejects
    malformed offsets with ValueError instead of reaching the C memcpy
    (r5 self-review findings)."""
    from pim_embedding_lookup_tpu.utils import native

    t = 2
    off = np.zeros((t, 9), np.int64)
    off[:, 1:] = np.cumsum(np.ones((t, 8)), axis=1)
    idx = np.zeros((t, 8), np.int32)
    plan = plan_length_buckets(off, bucket_ls=(1,), slack=1.0)

    bad_off = np.zeros((t, 5), np.int64)
    bad_off[:, 1:] = np.cumsum(np.ones((t, 4)), axis=1)
    for impl in ("numpy", "auto"):
        with pytest.raises(ValueError, match="plan batch"):
            pack_length_buckets(
                np.zeros((t, 4), np.int32), bad_off, plan, impl=impl
            )

    if native.available():
        mal = off.copy()
        mal[0, 3] = 1  # decreasing pair -> negative length
        with pytest.raises(ValueError, match="non-decreasing"):
            native.pack_buckets(
                idx, mal, bucket_ls=(1,), capacities=(8,),
                tail_bags=0, tail_entries=0,
            )


def test_quantized_scale_mode_validated_on_direct_construction():
    """scale_mode typos raise even when the dataclass is constructed
    directly (models/quantize.py path), not only via create()."""
    from pim_embedding_lookup_tpu.parallel import make_mesh
    from pim_embedding_lookup_tpu.parallel.planner import plan

    mesh = make_mesh(MeshConfig(data=2, model=4))
    lay = plan(TABLES, 4, ShardingPolicy.ROW_HASH, True)
    with pytest.raises(ValueError, match="scale_mode"):
        QuantizedEmbeddingCollection(layout=lay, mesh=mesh, scale_mode="Table")
