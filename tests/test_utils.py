"""Utils tests: native feeder, Criteo loaders, profiling CSV, checkpoint."""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.data.criteo import CriteoKaggle
from pim_embedding_lookup_tpu.utils import (
    IntervalRecorder,
    PhaseTimer,
    write_intervals_csv,
)
from pim_embedding_lookup_tpu.utils import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(REPO, "native", "libpelfeeder.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("no C++ toolchain")
    if not native.available():
        pytest.skip("native lib not loadable")
    return so


def test_native_uniform_bounds_and_determinism(native_lib):
    rows = np.array([100, 5000], dtype=np.int64)
    q1 = native.gen_query(rows, batch=64, pooling=8, seed=7)
    q2 = native.gen_query(rows, batch=64, pooling=8, seed=7)
    q3 = native.gen_query(rows, batch=64, pooling=8, seed=8)
    assert q1.shape == (2, 64, 8) and q1.dtype == np.int32
    np.testing.assert_array_equal(q1, q2)
    assert not np.array_equal(q1, q3)
    for t, n in enumerate(rows):
        assert q1[t].min() >= 0 and q1[t].max() < n
    # uniform should cover a healthy fraction of a small id space
    assert len(np.unique(q1[0])) > 60


def test_native_zipf_skew(native_lib):
    rows = np.array([10000], dtype=np.int64)
    q = native.gen_query(rows, batch=512, pooling=16, distribution="zipf",
                         alpha=1.2, seed=3)
    assert q.min() >= 0 and q.max() < 10000
    # power-law: id 0 must dominate
    counts = np.bincount(q.ravel(), minlength=10000)
    assert counts[0] > counts[100:].max()
    assert counts[:10].sum() > 0.3 * counts.sum()


def test_native_criteo_parser(native_lib, tmp_path):
    raw = tmp_path / "train.txt"
    lines = [
        "1\t5\t\t3" + "\t1" * 10 + "\t" + "\t".join(["0a1b2c3d"] * 26),
        "0" + "\t2" * 13 + "\t" + "\t".join([""] * 26),
    ]
    raw.write_text("\n".join(lines) + "\n")
    out = native.parse_criteo_raw(str(raw), max_rows=10)
    assert out is not None
    labels, dense, cat = out
    assert len(labels) == 2
    np.testing.assert_array_equal(labels, [1.0, 0.0])
    assert dense[0, 0] == 5 and dense[0, 1] == 0 and dense[0, 2] == 3
    assert dense[1, 0] == 2
    assert cat[0, 0] == (0x0A1B2C3D % (1 << 20))
    assert np.all(cat[1] == 0)


def test_criteo_python_raw_parser(tmp_path):
    raw = tmp_path / "train.txt"
    lines = [
        "1\t5\t\t3" + "\t1" * 10 + "\t" + "\t".join(["0a1b2c3d"] * 26),
        "0" + "\t2" * 13 + "\t" + "\t".join(["ff"] * 26),
    ]
    raw.write_text("\n".join(lines) + "\n")
    ds = CriteoKaggle.parse_raw(str(raw))
    assert ds.x_int.shape == (2, 13)
    assert ds.x_cat.shape == (2, 26)
    assert abs(ds.x_int[0, 0] - np.log1p(5)) < 1e-6
    batches = list(ds.batches(batch_size=2))
    dense, idx, mask, labels = batches[0]
    assert idx.shape == (26, 2) and mask.all()


def test_criteo_npz_roundtrip(tmp_path):
    n = 50
    rng = np.random.default_rng(0)
    path = tmp_path / "proc.npz"
    counts = np.array([10, 20, 30] + [5] * 23)
    np.savez(
        path,
        X_int=rng.integers(0, 100, size=(n, 13)),
        X_cat=rng.integers(0, 1000, size=(n, 26)),
        y=rng.integers(0, 2, size=n),
        counts=counts,
    )
    ds = CriteoKaggle.load_npz(str(path))
    assert (ds.x_cat < counts[None, :]).all()
    cfg = ds.dlrm_config(dim=8)
    assert cfg.num_tables == 26 and cfg.tables[1].num_rows == 20
    tr, te = ds.split()
    assert len(tr.y) + len(te.y) == n


def test_phase_timer_and_intervals(tmp_path):
    pt = PhaseTimer()
    x = jnp.arange(1000.0)
    for _ in range(3):
        with pt.phase("launch", sync=x):
            y = (x * 2).sum()
    rep = pt.report()
    assert "launch" in rep and rep["launch"] > 0
    rec = IntervalRecorder()
    with rec.record(0, "lookup"):
        pass
    with rec.record(1, "lookup"):
        pass
    csv_path = str(tmp_path / "iv.csv")
    write_intervals_csv(csv_path, rec.intervals)
    text = open(csv_path).read()
    assert "rank_id" in text and text.count("lookup") == 2


def test_gantt_plot(tmp_path):
    pytest.importorskip("matplotlib")
    from pim_embedding_lookup_tpu.utils import plot_gantt

    rec = IntervalRecorder()
    for unit in range(4):
        with rec.record(unit, "lookup"):
            pass
    csv_path = str(tmp_path / "iv.csv")
    write_intervals_csv(csv_path, rec.intervals)
    png = str(tmp_path / "gantt.png")
    plot_gantt(csv_path, png)
    assert os.path.getsize(png) > 1000


def test_profiler_trace_smoke(tmp_path):
    """jax.profiler trace context produces a trace artifact (the Chrome-trace
    analog of upmem/test.json)."""
    from pim_embedding_lookup_tpu.utils import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jax.block_until_ready(jnp.arange(1000.0).sum())
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "no trace output written"


def test_cost_stats():
    from pim_embedding_lookup_tpu.utils import cost_stats

    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((128, 128))
    stats = cost_stats(f, x, x)
    assert stats["flops"] > 0


def test_checkpoint_roundtrip(tmp_path):
    from pim_embedding_lookup_tpu.utils import checkpoint

    state = {
        "emb": jnp.arange(12.0).reshape(3, 4),
        "step": jnp.asarray(7),
        "nested": {"w": jnp.ones((2, 2))},
    }
    p = str(tmp_path / "ckpt")
    checkpoint.save(p, state)
    restored = checkpoint.restore(p, state)
    np.testing.assert_array_equal(np.asarray(restored["emb"]), np.asarray(state["emb"]))
    assert int(restored["step"]) == 7


def test_device_prefetch():
    from pim_embedding_lookup_tpu.data.prefetch import device_prefetch

    batches = [
        {"x": np.ones((4, 4)) * i, "y": np.arange(4) + i} for i in range(5)
    ]
    seen = list(device_prefetch(iter(batches), buffer_size=2))
    assert len(seen) == 5
    for i, b in enumerate(seen):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_device_prefetch_propagates_errors():
    from pim_embedding_lookup_tpu.data.prefetch import device_prefetch

    def gen():
        yield {"x": np.ones(2)}
        raise ValueError("boom")

    it = device_prefetch(gen())
    next(it)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_native_pack_csr_matches_shard_csr():
    """Native CSR wire packer == ops.ragged.shard_csr on random ragged bags
    (incl. empty bags and full windows); overflow raises."""
    from pim_embedding_lookup_tpu.ops.ragged import shard_csr
    from pim_embedding_lookup_tpu.utils import native

    if not native.available():
        pytest.skip("native feeder not built")
    rng = np.random.default_rng(4)
    t, b, nd, cap = 3, 12, 2, 24
    bags = [
        [
            rng.integers(0, 500, size=rng.integers(0, 5)).astype(int).tolist()
            for _ in range(b)
        ]
        for _ in range(t)
    ]
    want_idx, want_off = shard_csr(bags, nd, cap, pad_index=7)

    lens = np.asarray(
        [[len(bag) for bag in tb] for tb in bags], dtype=np.int32
    )
    flat = [i for tb in bags for bag in tb for i in bag]
    values = np.asarray(flat, dtype=np.int32)
    voff = np.zeros(t + 1, np.int64)
    np.cumsum(lens.sum(axis=1), out=voff[1:])
    got = native.pack_csr(
        values, voff, lens, num_shards=nd, capacity_per_shard=cap,
        pad_index=7,
    )
    assert got is not None
    np.testing.assert_array_equal(got[0], want_idx)
    np.testing.assert_array_equal(got[1], want_off)

    with pytest.raises(ValueError, match="exceeds capacity"):
        native.pack_csr(
            values, voff, lens, num_shards=nd, capacity_per_shard=2,
        )
