"""Serving load generator: latency-under-load for the inference path.

Capability analog of the reference's PIM-DeepRecSys submodule (SURVEY.md §0:
"Inference load/query generator (Harvard DeepRecSys fork)" — empty in the
snapshot): generates a Poisson query arrival stream against the jitted DLRM
forward and reports throughput + latency percentiles (p50/p95/p99), the
serving-side metrics a recommender deployment cares about.

Measurement validity (r2 fix — VERDICT r1 weak #3): this environment's
remote tunnel DEDUPES repeated identical dispatches (docs/PERF.md rule 1),
so the r1 version's 8-request reused pool produced fantasy percentiles.
Every dispatch is unique twice over: (a) each arrival carries its own
payload drawn from a ``--pool`` of distinct index streams, and (b) a
per-dispatch int32 ``salt`` mixes into the dense features, so even pool
wrap-around never repeats a (program, args) pair bit-for-bit.

Payload fidelity (r4 fix — VERDICT r3 weak #3): aggregated dispatches
CONCATENATE the actual queued requests' tensors (host-side stack + H2D at
dispatch — the real serving data path), and partial flushes dispatch into
the smallest compiled BATCH BUCKET that fits instead of paying the full
M-request compute.  Each bucket costs one XLA compile at startup (bucket
sizes and compile seconds are reported in the JSON).

Zipf mode (``--zipf a``) draws power-law ids — the traffic shape real
recommenders see — and ``--routed [--hot-k K]`` serves the sharded big set
through the all-to-all routing path with an optional replicated hot-row
cache (parallel/hotcache.py), so the cache's routed-load effect is
measurable here (VERDICT r1 item 10).  ``--capacity-factor`` defaults to
the library's drop-impossible safe value; an explicit lower value is the
throughput mode (drops counted and reported).

Batch aggregation (``--microbatch M`` + ``--max-wait-ms``) implements the
core PIM-DeepRecSys serving policy: up to M queued requests are stacked
into ONE device dispatch (per-dispatch cost amortizes M-ways; saturation
qps scales ~M), with an SLA deadline that flushes partial batches.
``--inflight N`` additionally pipelines N outstanding dispatches.
Latency is arrival-to-completion (queueing included).

    python tools/serving_bench.py --qps 200 --duration 10
    python tools/serving_bench.py --hybrid --microbatch 8 --qps 400
    python tools/serving_bench.py --hybrid --zipf 1.1 --routed --hot-k 1024
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
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "int8"],
                    help="int8 = quantize the (hybrid: big-set) embeddings "
                         "for serving (models/quantize.py) — the capacity "
                         "mode's latency-under-load")
    ap.add_argument("--pool", type=int, default=32,
                    help="distinct pre-generated request payloads (each "
                         "arrival takes the next one; streams never repeat "
                         "within a dispatch)")
    ap.add_argument("--inflight", type=int, default=1,
                    help="max outstanding async dispatches (1 = strict "
                         "serial client; >1 pipelines over the device and "
                         "the dispatch RTT)")
    ap.add_argument("--microbatch", type=int, default=1,
                    help="aggregate up to M queued requests into ONE "
                         "dispatch (the DeepRecSys batch-aggregation "
                         "policy): per-dispatch cost is amortized M-ways, "
                         "so saturation qps scales ~M")
    ap.add_argument("--max-wait-ms", type=float, default=10.0,
                    help="microbatch aggregation deadline: dispatch a "
                         "partial batch once the oldest queued request "
                         "has waited this long (the SLA knob)")
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="zipf exponent for skewed ids (0 = uniform)")
    ap.add_argument("--routed", action="store_true",
                    help="route sharded lookups via all_to_all (multi-chip)")
    ap.add_argument("--capacity-factor", type=float, default=None,
                    help="routed bucket capacity factor (default: the "
                         "library's drop-impossible safe_capacity_factor; "
                         "lower = throughput mode, drops counted)")
    ap.add_argument("--hot-k", type=int, default=0,
                    help="replicate the K hottest rows (routed mode only)")
    ap.add_argument("--canned-payload", action="store_true",
                    help="pre-stage full-microbatch device payloads and "
                         "reuse them per dispatch instead of concatenating "
                         "the actual queued requests (A/B knob: isolates "
                         "this environment's tunnel H2D cost from the "
                         "aggregation policy; NOT the real serving data "
                         "path)")
    ap.add_argument("--stage", default="arrival",
                    choices=["arrival", "dispatch"],
                    help="when request tensors go to the device: 'arrival' "
                         "= async device_put as each request arrives (H2D "
                         "overlaps in-flight dispatches; concat happens "
                         "in-graph), 'dispatch' = host concat + H2D on the "
                         "dispatch path (the r4 semantics)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, kaggle_config, random_config, toy_config,
    )
    from pim_embedding_lookup_tpu.models import DLRM
    from pim_embedding_lookup_tpu.parallel import make_mesh
    from pim_embedding_lookup_tpu.parallel.hybrid import HybridEmbeddingCollection

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
    coll = model.collection
    if args.dtype == "int8":
        from pim_embedding_lookup_tpu.models import quantize_dlrm_embeddings

        coll, params = quantize_dlrm_embeddings(model, params)
        jax.block_until_ready(params["emb"])
    hybrid = isinstance(coll, HybridEmbeddingCollection)
    routed = args.routed and jax.device_count() > 1 and policy != ShardingPolicy.REPLICATE

    rng = np.random.default_rng(args.seed)
    t = len(cfg.tables)
    b, l = args.batch, args.pooling
    mb = max(1, args.microbatch)

    def draw_ids(tb, n):
        if args.zipf > 1.0:
            return np.minimum(rng.zipf(args.zipf, size=n) - 1, tb.num_rows - 1)
        return rng.integers(0, tb.num_rows, size=n)

    def make_request():
        """ONE logical request's payload (host numpy — H2D happens at
        dispatch, the real serving data path)."""
        dense = rng.random((b, cfg.dense_dim)).astype(np.float32)
        idx_np = np.stack(
            [draw_ids(tb, b * l) for tb in cfg.tables]
        ).astype(np.int32)
        return dense, idx_np

    pool = [make_request() for _ in range(args.pool)]
    canned = None
    if args.canned_payload:
        # full-mb-sized device-staged payloads (r3 semantics): dispatch cost
        # excludes per-request H2D, so this measures the aggregation policy
        # against the executor ceiling only
        import jax.numpy as _jnp

        canned = []
        for ci in range(args.pool):
            ps = [pool[(ci + j) % len(pool)] for j in range(mb)]
            canned.append((
                _jnp.asarray(np.concatenate([p[0] for p in ps])),
                _jnp.asarray(np.concatenate([p[1] for p in ps], axis=1)),
            ))

    hot_cache = None
    hot_hit_rate = None
    if routed and args.hot_k:
        from pim_embedding_lookup_tpu.parallel.hotcache import (
            build_hot_cache, hot_ids_from_sample,
        )

        target = coll.big if hybrid else coll
        sel = list(coll.big_ids) if hybrid else list(range(t))
        sample = np.concatenate([r[1][sel] for r in pool], axis=1)
        emb_t = params["emb"]["big"] if hybrid else params["emb"]
        hot_ids = hot_ids_from_sample(target, sample, args.hot_k)
        hot_cache = build_hot_cache(target, emb_t, hot_ids)
        # routed-load reduction: cache hits are served from the local
        # replica and never enter the all-to-all, so the hit rate IS the
        # fraction of big-set entries removed from routing (VERDICT item 10)
        offs = np.asarray(target.layout.row_offsets, dtype=np.int64)
        fused = (sample.astype(np.int64) + offs[:, None]).reshape(-1)
        hot_hit_rate = round(float(np.isin(fused, hot_ids).mean()), 4)

    cf = args.capacity_factor  # None -> library safe_capacity_factor

    # --- compiled batch buckets (partial flushes pay bucket-sized compute,
    # not full-M): up to 3 sizes — 1, ~M/4, M ---------------------------------
    buckets = sorted({1, mb} | ({max(2, mb // 4)} if mb >= 8 else set()))

    def make_serve(nb):
        bd = b * nb
        mask = jnp.ones((t, bd * l), bool)

        @jax.jit
        def serve(params, dense_parts, idx_parts, salt):
            # parts concatenate IN-GRAPH (one dispatch whether the caller
            # passes nb per-request arrays — already-staged device buffers
            # in --stage arrival — or one pre-concatenated array); salt
            # keeps every dispatch's args unique (dedup-proof) even if a
            # pool combination recurs
            dense = jnp.concatenate(dense_parts)
            idx = jnp.concatenate(idx_parts, axis=1)
            dense = dense + (salt.astype(jnp.float32) % 977.0) * 1e-7
            emb = params["emb"]
            if routed and hybrid:
                pooled = coll.lookup(
                    emb, idx, mask, batch_size=bd, routed=True,
                    capacity_factor=cf, hot_cache=hot_cache,
                )
            elif routed:
                pooled = coll.lookup_routed(
                    emb, idx, mask, batch_size=bd,
                    capacity_factor=cf, hot_cache=hot_cache,
                )
            else:
                pooled = coll.lookup(emb, idx, mask, batch_size=bd)
            logits = model.apply_from_pooled(params, dense, pooled)
            return jax.nn.sigmoid(logits)

        return serve

    stage_arrival = args.stage == "arrival" and canned is None
    serve_fns = {}
    compile_s = {}
    for nb in buckets:
        serve_fns[nb] = make_serve(nb)
        t0 = time.perf_counter()
        if canned is not None:
            if nb != mb:
                continue  # canned dispatches only ever use the full bucket
            jax.block_until_ready(
                serve_fns[nb](params, (canned[0][0],), (canned[0][1],),
                              jnp.int32(0))
            )
        elif stage_arrival:
            # the production call shape: nb per-request staged arrays
            dp = tuple(jnp.asarray(pool[j % len(pool)][0]) for j in range(nb))
            ip = tuple(jnp.asarray(pool[j % len(pool)][1]) for j in range(nb))
            jax.block_until_ready(serve_fns[nb](params, dp, ip, jnp.int32(0)))
        else:
            d0 = np.concatenate([pool[0][0]] * nb)
            i0 = np.concatenate([pool[0][1]] * nb, axis=1)
            jax.block_until_ready(
                serve_fns[nb](params, (jnp.asarray(d0),), (jnp.asarray(i0),),
                              jnp.int32(0))
            )
        compile_s[nb] = round(time.perf_counter() - t0, 1)

    drops = None
    if routed:  # record the routed drop count for this traffic at this cf
        mask_mb = jnp.ones((t, b * mb * l), bool)
        idx_mb = jnp.asarray(np.concatenate([p[1] for p in pool[:mb]] if mb <= len(pool)
                                            else [pool[0][1]] * mb, axis=1))
        lk = (lambda e, i: coll.lookup(e, i, mask_mb, batch_size=b * mb,
                                       routed=True, capacity_factor=cf,
                                       hot_cache=hot_cache,
                                       return_stats=True)) if hybrid else (
            lambda e, i: coll.lookup_routed(e, i, mask_mb, batch_size=b * mb,
                                            capacity_factor=cf,
                                            hot_cache=hot_cache,
                                            return_stats=True))
        drops = int(jax.device_get(lk(params["emb"], idx_mb)[1]))

    # --inflight N pipelines up to N outstanding dispatches: JAX dispatch is
    # async, so the device (and this environment's tunnel RTT) overlaps
    # across requests instead of serializing client->device->client per
    # request — the continuous-batching serving posture.  Latency is
    # arrival-to-completion (queueing included, standard open-loop metric).
    # N=1 degenerates to the strict serial client.
    from collections import deque

    lat = []
    n_req = 0
    n_disp = 0
    n_arr = 0
    late_drops = 0
    pad_requests = 0
    inflight = deque()  # (arrival-times of the requests in the batch, out)
    pending = deque()  # (arrival timestamp, payload) awaiting aggregation
    max_wait = args.max_wait_ms / 1e3

    def drain(block):
        nonlocal n_req
        while inflight:
            arrivals, out = inflight[0]
            if not block and hasattr(out, "is_ready") and not out.is_ready():
                return
            jax.block_until_ready(out)
            done = time.perf_counter()
            lat.extend(done - a for a in arrivals)
            n_req += len(arrivals)
            inflight.popleft()
            if not block:
                continue
            return  # blocking mode frees exactly one slot

    def dispatch(batch_items):
        """Stack the ACTUAL queued requests' payloads into one dispatch,
        padded (by repeating the last payload) up to the smallest compiled
        bucket that fits — padding compute is counted, padded rows are not
        requests.

        --stage arrival: payloads are device arrays staged asynchronously
        when the request ARRIVED (jax.device_put returns immediately; the
        tunnel H2D overlaps the in-flight dispatches), so this path only
        references buffers and the concat happens in-graph.
        --stage dispatch (r4 semantics): payloads are host numpy; the
        concat + H2D cost sits on this critical path."""
        nonlocal n_disp, pad_requests
        k = len(batch_items)
        if canned is not None:
            dense, idx = canned[n_disp % len(canned)]
            out = serve_fns[mb](params, (dense,), (idx,), jnp.int32(n_disp))
            inflight.append(([a for a, _ in batch_items], out))
            n_disp += 1
            return
        nb = min(x for x in buckets if x >= k)
        pad_requests += nb - k
        payloads = [p for _, p in batch_items] + [batch_items[-1][1]] * (nb - k)
        if stage_arrival:
            out = serve_fns[nb](
                params,
                tuple(p[0] for p in payloads),
                tuple(p[1] for p in payloads),
                jnp.int32(n_disp),
            )
        else:
            dense = np.concatenate([p[0] for p in payloads])
            idx = np.concatenate([p[1] for p in payloads], axis=1)
            out = serve_fns[nb](
                params, (jnp.asarray(dense),), (jnp.asarray(idx),),
                jnp.int32(n_disp),
            )
        inflight.append(([a for a, _ in batch_items], out))
        n_disp += 1

    start = time.perf_counter()
    next_arrival = start
    while True:
        now = time.perf_counter()
        if now - start >= args.duration:
            break
        drain(block=False)
        # ingest Poisson arrivals into the aggregation queue; each arrival
        # carries its own payload (stacked verbatim at dispatch)
        while now >= next_arrival:
            if now - next_arrival > 1.0:  # hopelessly behind: count drops
                late_drops += 1
            else:
                payload = pool[n_arr % len(pool)]
                if stage_arrival:
                    # async H2D NOW (device_put returns immediately): the
                    # transfer rides the tunnel while earlier dispatches
                    # compute, instead of serializing on the dispatch path
                    payload = (
                        jax.device_put(payload[0]), jax.device_put(payload[1])
                    )
                pending.append((next_arrival, payload))
            n_arr += 1
            next_arrival += rng.exponential(1.0 / args.qps)
        # dispatch a microbatch when full, or when the oldest queued
        # request hits the aggregation deadline (partial batch)
        full = len(pending) >= mb
        expired = pending and (now - pending[0][0]) >= max_wait
        if not (full or expired):
            time.sleep(min(max(next_arrival - now, 0.0), 0.001))
            continue
        if len(inflight) >= args.inflight:
            drain(block=True)
        dispatch([pending.popleft() for _ in range(min(mb, len(pending)))])
    # drain the aggregation queue: requests that arrived before the
    # deadline are still served and counted (ADVICE r3: do not silently
    # discard pending arrivals when the duration elapses)
    while pending:
        if len(inflight) >= args.inflight:
            drain(block=True)
        dispatch([pending.popleft() for _ in range(min(mb, len(pending)))])
    while inflight:
        drain(block=True)

    wall = time.perf_counter() - start
    lat_ms = np.asarray(lat) * 1e3
    result = {
        "requests": n_req,
        "dropped": late_drops,
        "achieved_qps": round(n_req / wall, 1),
        "offered_qps": args.qps,
        "inflight": args.inflight,
        "microbatch": mb,
        "dispatches": n_disp,
        "batch": b,
        "dtype": args.dtype,
        "payload": "canned-staged" if canned is not None else (
            "real-arrival-staged" if stage_arrival else "real-concat"
        ),
        "buckets": buckets,
        "bucket_compile_s": compile_s,
        "padded_requests": pad_requests,
        "zipf": args.zipf,
        "routed": routed,
        "capacity_factor": cf if cf is not None else (
            coll.big.safe_capacity_factor if hybrid and coll.big is not None
            else getattr(coll, "safe_capacity_factor", None)
        ) if routed else None,
        "hot_k": args.hot_k if routed else 0,
        "hot_hit_rate": hot_hit_rate,
        "routed_entry_drops": drops,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 3),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 3),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
        "mean_ms": round(float(lat_ms.mean()), 3),
        "lookups_per_s": round(n_req * b * t / wall, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
