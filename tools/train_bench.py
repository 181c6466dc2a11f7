"""Honest training-throughput benchmark: in-graph loop over sparse train
steps with per-iteration batch rotation (see tools/kernel_lab.py for why
host-side loops cannot be trusted in this environment).

    python tools/train_bench.py --config kaggle --batch 8192 --iters 20
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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--optimizer", default="row_adagrad",
                    choices=["sgd", "row_adagrad"])
    ap.add_argument("--hybrid", action="store_true",
                    help="MXU small-table + lane-packed gather big-table "
                         "embedding collection")
    ap.add_argument("--no-packed", action="store_true",
                    help="disable lane-packed storage (hybrid big set)")
    ap.add_argument("--routed", action="store_true",
                    help="all-to-all id routing for the sharded lookup + "
                         "scatter update (multi-chip scaling path)")
    ap.add_argument("--capacity-factor", type=float, default=2.0,
                    help="routed bucket capacity (throughput mode)")
    ap.add_argument("--wire", default="dense", choices=["dense", "csr"],
                    help="query wire shape: dense padded [T,B*L] or the "
                         "reference's CSR indices+offsets (emb_host.h:234) "
                         "— forward lookup_csr + CSR scatter update")
    ap.add_argument("--lr", type=float, default=None,
                    help="learning rate (default 0.1/pooling: SUM pooling "
                         "scales each bag's pooled delta by ~L*lr per step, "
                         "so the single-hot contract lr 0.1 diverges to NaN "
                         "within 4 steps at pooling 120 — measured; timing "
                         "is lr-independent, the derate keeps the loss "
                         "trace finite)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pim_embedding_lookup_tpu.config import (
        MeshConfig, ShardingPolicy, kaggle_config, random_config, toy_config,
    )
    from pim_embedding_lookup_tpu.models import DLRM
    from pim_embedding_lookup_tpu.models.dlrm import bce_loss
    from pim_embedding_lookup_tpu.models.sparse_train import make_sparse_train_state
    from pim_embedding_lookup_tpu.models.sparse_train import (
        _apply_sparse, _apply_sparse_csr,
    )
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
    if args.hybrid:
        from pim_embedding_lookup_tpu.parallel.hybrid import (
            HybridEmbeddingCollection,
        )

        model = DLRM(cfg, mesh, policy, hybrid=True)
        if args.no_packed:
            model.collection = HybridEmbeddingCollection.create(
                cfg.tables, mesh, policy, packed=False
            )
    else:
        model = DLRM(cfg, mesh, policy)
    params = model.init(jax.random.PRNGKey(0))
    jax.block_until_ready(params["emb"])
    print("init done", file=sys.stderr)

    lr = args.lr if args.lr is not None else 0.1 / max(1, args.pooling)
    dense_opt, opt_state, acc = make_sparse_train_state(model, params, lr=lr)
    dense_params = {k: params[k] for k in ("bot", "top")}
    emb = params["emb"]
    coll = model.collection

    b, l, t = args.batch, args.pooling, len(cfg.tables)
    rng = np.random.default_rng(0)
    dense_x = jnp.asarray(rng.random((b, cfg.dense_dim), dtype=np.float32))
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, tb.num_rows, size=b * l) for tb in cfg.tables]
        ).astype(np.int32)
    )
    mask = jnp.ones((t, b * l), bool)
    labels = jnp.asarray((rng.random(b) < 0.5).astype(np.float32))
    rows_arr = jnp.asarray([tb.num_rows for tb in cfg.tables], dtype=jnp.int32)
    stride = jnp.asarray(
        [max(1, tb.num_rows // 7 + 1) for tb in cfg.tables], dtype=jnp.int32
    )

    from pim_embedding_lookup_tpu.parallel.hybrid import (
        HybridEmbeddingCollection as _Hyb,
    )

    routed = args.routed and jax.device_count() > 1
    cf = args.capacity_factor
    csr_wire = args.wire == "csr"
    # fixed-L bags expressed as the reference's CSR offsets (emb_host.h:234)
    # — the engine sees the generic ragged forward + CSR scatter backward
    offsets = jnp.asarray(
        np.tile(np.arange(b + 1, dtype=np.int32) * l, (t, 1))
    ) if csr_wire else None

    def _lookup(emb, idx_i):
        if csr_wire:
            if routed:
                return coll.lookup_csr(emb, idx_i, offsets, routed=True,
                                       capacity_factor=cf)
            return coll.lookup_csr(emb, idx_i, offsets)
        if not routed:
            return coll.lookup(emb, idx_i, mask, batch_size=b)
        if isinstance(coll, _Hyb):
            return coll.lookup(emb, idx_i, mask, batch_size=b, routed=True,
                               capacity_factor=cf)
        return coll.lookup_routed(emb, idx_i, mask, batch_size=b,
                                  capacity_factor=cf)

    def step_body(emb, acc, dp, os_, idx_i):
        pooled = _lookup(emb, idx_i)

        def loss_fn(dp_, pooled_):
            logits = model.apply_from_pooled({**dp_, "emb": None}, dense_x, pooled_)
            return bce_loss(logits, labels)

        loss, (g_dense, g_pooled) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dp, pooled
        )
        updates, os_ = dense_opt.update(g_dense, os_, dp)
        dp = optax.apply_updates(dp, updates)
        if csr_wire:
            emb, acc = _apply_sparse_csr(
                coll, emb, acc, idx_i, offsets, g_pooled,
                lr=lr, optimizer=args.optimizer, eps=1e-8,
                routed=routed, capacity_factor=cf if routed else None,
            )
        else:
            emb, acc = _apply_sparse(
                coll, emb, acc, idx_i, mask, g_pooled,
                lr=lr, optimizer=args.optimizer, eps=1e-8,
                routed=routed, capacity_factor=cf if routed else None,
            )
        return emb, acc, dp, os_, loss

    @jax.jit
    def loop(emb, acc, dp, os_, idx, nn):
        def body(i, carry):
            emb, acc, dp, os_, idx_i, lsum = carry
            emb, acc, dp, os_, loss = step_body(emb, acc, dp, os_, idx_i)
            idx_next = (idx_i + stride[:, None]) % rows_arr[:, None]
            return emb, acc, dp, os_, idx_next, lsum + loss

        emb, acc, dp, os_, _, lsum = jax.lax.fori_loop(
            0, nn, body, (emb, acc, dp, os_, idx, jnp.float32(0))
        )
        return emb, acc, dp, os_, lsum

    t0 = time.time()
    state = loop(emb, acc, dense_params, opt_state, idx, 2)
    jax.block_until_ready(state[-1])
    print(f"compiled+warm in {time.time()-t0:.0f}s", file=sys.stderr)
    emb, acc, dense_params, opt_state, _ = state

    t0 = time.perf_counter()
    state = loop(emb, acc, dense_params, opt_state, idx, args.iters)
    jax.block_until_ready(state[-1])
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"{args.config}_sparse_train_step",
        "routed": routed,
        "wire": args.wire,
        "lr": lr,
        "us_per_step": round(dt * 1e6, 1),
        "samples_per_s": round(b / dt, 1),
        "loss_mean": float(state[-1]) / args.iters,
    }))


if __name__ == "__main__":
    main()
