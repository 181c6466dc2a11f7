"""Per-phase lookup latency report — the reference's six phase prints
(emb_host.h:395-402: indices/offsets copy-in, query-len copy, dpu_launch,
results copy-out, callback prep, dpu_sync) mapped to the TPU path's stages:

  feed       host -> HBM transfer of the query (indices + mask)
  dispatch   jitted lookup dispatch returning (async) device futures
  compute    device execution until results are ready (block_until_ready)
  fetch      HBM -> host copy of the pooled [B, T, D] block
  decode     host-side ndarray view (the /1e9-fixed-point-decode slot —
             a no-op here because TPUs pool in float; kept for parity)

Each phase is device-synchronized before timing the next.  NOTE: in
this development environment every phase rides the remote axon tunnel, so
feed/fetch measure the TUNNEL (measured: ~0.4GB/s H2D, ~3MB/s D2H — a
13.6MB pooled block takes ~4s to fetch) and compute includes the dispatch
round-trip.  On a real TPU host these are PCIe/DMA speeds.  For honest
device throughput use bench.py's in-graph loop; this tool's purpose is
the phase BREAKDOWN and transfer-cost visibility.

    python tools/phase_bench.py --config kaggle --batch 8192 --iters 20
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="kaggle",
                    choices=["kaggle", "random", "toy"])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hybrid", action="store_true", default=True)
    ap.add_argument("--no-hybrid", dest="hybrid", action="store_false")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, kaggle_config, random_config, toy_config,
    )
    from pim_embedding_lookup_tpu.parallel import (
        EmbeddingCollection, HybridEmbeddingCollection, make_mesh,
    )
    from pim_embedding_lookup_tpu.utils.profiling import PhaseTimer

    cfg = {"kaggle": kaggle_config, "random": random_config,
           "toy": toy_config}[args.config]()
    tables = cfg.tables
    mesh = make_mesh(MeshConfig(data=1, model=jax.device_count()))
    policy = (
        ShardingPolicy.REPLICATE
        if jax.device_count() == 1
        else ShardingPolicy.ROW_HASH
    )
    if args.hybrid:
        coll = HybridEmbeddingCollection.create(tables, mesh, policy)
    else:
        coll = EmbeddingCollection.create(tables, mesh, policy, packed="auto")
    params = coll.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    t, b, l = len(tables), args.batch, args.pooling
    lookup = jax.jit(
        lambda p, i, m: coll.lookup(p, i, m, batch_size=b)
    )

    # warm compile
    idx_np = np.stack(
        [rng.integers(0, tb.num_rows, size=b * l) for tb in tables]
    ).astype(np.int32)
    mask_np = np.ones((t, b * l), bool)
    out = lookup(jax.device_put(params), jnp.asarray(idx_np),
                 jnp.asarray(mask_np))
    jax.block_until_ready(out)

    timer = PhaseTimer()
    for _ in range(args.iters):
        idx_np = np.stack(
            [rng.integers(0, tb.num_rows, size=b * l) for tb in tables]
        ).astype(np.int32)
        with timer.phase("feed"):
            idx = jax.device_put(jnp.asarray(idx_np))
            mask = jax.device_put(jnp.asarray(mask_np))
            jax.block_until_ready((idx, mask))
        with timer.phase("dispatch"):
            out = lookup(params, idx, mask)
        with timer.phase("compute", sync=out):
            pass
        with timer.phase("fetch"):
            host = np.asarray(out)
        with timer.phase("decode"):
            _ = host.view()  # float path: no fixed-point decode needed
    print(json.dumps({
        "metric": "lookup_phase_latency_us",
        "config": args.config,
        "batch": b,
        "phases_us": {k: round(v, 1) for k, v in timer.report().items()},
        "note": (
            "feed/fetch ride this environment's remote axon tunnel "
            "(~0.4GB/s H2D, ~3MB/s D2H), so they measure the TUNNEL, not "
            "PCIe/DMA — e.g. a 13.6MB pooled fetch takes seconds here. "
            "Portable signals: compute, and the phase STRUCTURE. Device "
            "throughput truth lives in bench.py's in-graph loop."
        ),
    }))


if __name__ == "__main__":
    main()
