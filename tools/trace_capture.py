"""Capture committed trace artifacts — the analog of the reference's
checked-in ``upmem/test.json`` (a 3.6MB Chrome trace of SDK internals over a
100-lookup toy run, SURVEY.md §2 "SDK-level trace capture").

Produces, under --out (default benchmarks/trace/):
  * perfetto_trace.json.gz — jax.profiler capture of N timed lookups,
    loadable at ui.perfetto.dev (same ecosystem as the reference's
    chrome://tracing artifact)
  * intervals.csv + gantt.png — per-shard busy intervals through
    IntervalRecorder -> the Gantt plotter (graph/runtime_intervals/main.py
    parity)

    python tools/trace_capture.py --config kaggle --batch 1024 --iters 3
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="kaggle",
                    choices=["kaggle", "random", "toy"])
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, kaggle_config, random_config, toy_config,
    )
    from pim_embedding_lookup_tpu.parallel import make_mesh
    from pim_embedding_lookup_tpu.parallel.hybrid import HybridEmbeddingCollection
    from pim_embedding_lookup_tpu.utils.profiling import (
        IntervalRecorder, plot_gantt, trace, write_intervals_csv,
    )

    cfg = {"kaggle": kaggle_config, "random": random_config,
           "toy": toy_config}[args.config]()
    mesh = make_mesh(MeshConfig(data=1, model=jax.device_count()))
    policy = (ShardingPolicy.REPLICATE if jax.device_count() == 1
              else ShardingPolicy.ROW_HASH)
    coll = HybridEmbeddingCollection.create(cfg.tables, mesh, policy)
    params = coll.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    t, b, l = len(cfg.tables), args.batch, args.pooling
    mask = jnp.ones((t, b * l), bool)

    def query(i):
        return jnp.asarray(np.stack([
            rng.integers(0, tb.num_rows, size=b * l) for tb in cfg.tables
        ]).astype(np.int32))

    lookup = jax.jit(lambda p, i: coll.lookup(p, i, mask, batch_size=b))
    # warm/compile outside the trace window so the capture shows steady state
    jax.block_until_ready(lookup(params, query(-1)))

    os.makedirs(args.out, exist_ok=True)
    tmpdir = "/tmp/pel_trace_capture"
    shutil.rmtree(tmpdir, ignore_errors=True)

    rec = IntervalRecorder()
    with trace(tmpdir):
        for i in range(args.iters):
            q = query(i)
            with rec.record(unit=i % max(jax.device_count(), 1),
                            label=f"lookup_{i}"):
                jax.block_until_ready(lookup(params, q))

    csv_path = os.path.join(args.out, "intervals.csv")
    write_intervals_csv(csv_path, rec.intervals)
    plot_gantt(csv_path, os.path.join(args.out, "gantt.png"))

    # the profiler writes plugins/profile/<ts>/*.trace.json.gz — copy the
    # perfetto trace up as a stable-named artifact
    hits = sorted(glob.glob(
        os.path.join(tmpdir, "**", "*.trace.json.gz"), recursive=True))
    if hits:
        dst = os.path.join(args.out, "perfetto_trace.json.gz")
        shutil.copy(hits[-1], dst)
        print(f"trace: {dst} ({os.path.getsize(dst)/1e3:.0f} KB)")
    else:
        print("WARNING: profiler produced no .trace.json.gz "
              f"(contents: {glob.glob(os.path.join(tmpdir, '**'), recursive=True)[:8]})")
    print(f"intervals: {csv_path} ({len(rec.intervals)} rows)")


if __name__ == "__main__":
    main()
