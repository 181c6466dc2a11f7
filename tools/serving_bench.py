"""Serving load generator: latency-under-load for the inference path.

Capability analog of the reference's PIM-DeepRecSys submodule (SURVEY.md §0:
"Inference load/query generator (Harvard DeepRecSys fork)" — empty in the
snapshot): generates a Poisson query arrival stream against the jitted DLRM
forward and reports throughput + latency percentiles (p50/p95/p99), the
serving-side metrics a recommender deployment cares about.

    python tools/serving_bench.py --qps 200 --duration 10
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="kaggle", choices=["kaggle", "random", "toy"])
    ap.add_argument("--batch", type=int, default=256, help="queries per request")
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--qps", type=float, default=100.0, help="request arrivals/s")
    ap.add_argument("--duration", type=float, default=10.0, help="seconds")
    ap.add_argument("--hybrid", action="store_true",
                    help="MXU small-table + lane-packed gather collection")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, kaggle_config, random_config, toy_config,
    )
    from pim_embedding_lookup_tpu.models import DLRM, make_eval_step
    from pim_embedding_lookup_tpu.parallel import make_mesh

    cfg = {"kaggle": kaggle_config, "random": random_config, "toy": toy_config}[
        args.config
    ]()
    mesh = make_mesh(MeshConfig(data=1, model=jax.device_count()))
    policy = (
        ShardingPolicy.REPLICATE
        if jax.device_count() == 1
        else ShardingPolicy.ROW_HASH  # balanced ownership (docs/PERF.md)
    )
    model = DLRM(cfg, mesh, policy, hybrid=args.hybrid)
    params = model.init(jax.random.PRNGKey(args.seed))
    jax.block_until_ready(params["emb"])
    eval_step = make_eval_step(model)

    rng = np.random.default_rng(args.seed)
    t = len(cfg.tables)
    b, l = args.batch, args.pooling

    def make_request():
        dense = jnp.asarray(rng.random((b, cfg.dense_dim), dtype=np.float32))
        idx = jnp.asarray(
            np.stack(
                [rng.integers(0, tb.num_rows, size=b * l) for tb in cfg.tables]
            ).astype(np.int32)
        )
        mask = jnp.ones((t, b * l), bool)
        return dense, idx, mask

    # pre-generate a pool of requests so host-side generation isn't the
    # bottleneck (the C feeder covers the production feed path)
    pool = [make_request() for _ in range(8)]
    # warmup/compile
    jax.block_until_ready(eval_step(params, *pool[0]))

    lat = []
    n_req = 0
    dropped = 0
    start = time.perf_counter()
    next_arrival = start
    while True:
        now = time.perf_counter()
        if now - start >= args.duration:
            break
        if now < next_arrival:
            time.sleep(min(next_arrival - now, 0.001))
            continue
        # Poisson arrivals
        next_arrival += rng.exponential(1.0 / args.qps)
        if now - next_arrival > 1.0:  # hopelessly behind: count drops
            dropped += 1
            continue
        t0 = time.perf_counter()
        out = eval_step(params, *pool[n_req % len(pool)])
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
        n_req += 1

    wall = time.perf_counter() - start
    lat_ms = np.asarray(lat) * 1e3
    result = {
        "requests": n_req,
        "dropped": dropped,
        "achieved_qps": round(n_req / wall, 1),
        "offered_qps": args.qps,
        "batch": b,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "mean_ms": round(float(lat_ms.mean()), 3),
        "lookups_per_s": round(n_req * b * t / wall, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
