"""Memory-efficient training: dense tower via optax, embedding half via
fused sparse scatter-update (parallel/sparse_update.py).

The default train step (train.py) differentiates through the lookup, which
makes XLA materialize a dense [total_rows, D] embedding cotangent.  This
step instead:

  1. runs the lookup forward,
  2. differentiates only the dense tower w.r.t. (dense params, pooled),
  3. applies d(loss)/d(pooled) straight into the sharded table with a
     scatter-add optimizer step (SGD or row-wise AdaGrad),

so peak memory stays O(table + batch) and the update cost is O(entries) —
the property that makes 100M-row tables trainable (BASELINE.json synthetic
big-table config).  The fused table is donated through the jit boundary, so
the update happens in-place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..parallel.hybrid import (
    HybridEmbeddingCollection,
    init_accumulator_hybrid,
    sparse_update_hybrid,
    sparse_update_hybrid_csr,
)
from ..parallel.sparse_update import (
    init_accumulator,
    sparse_update,
    sparse_update_csr,
)
from .dlrm import DLRM, bce_loss


def _init_acc(coll):
    if isinstance(coll, HybridEmbeddingCollection):
        return init_accumulator_hybrid(coll)
    return init_accumulator(coll)


def _apply_sparse(coll, emb, acc, indices, mask, g_pooled, *, lr, optimizer,
                  eps, routed=False, capacity_factor=None):
    if isinstance(coll, HybridEmbeddingCollection):
        return sparse_update_hybrid(
            coll, emb, acc, indices, mask, g_pooled,
            lr=lr, optimizer=optimizer, eps=eps,
            routed=routed, capacity_factor=capacity_factor,
        )
    return sparse_update(
        coll, emb, acc, indices, mask, g_pooled,
        lr=lr, optimizer=optimizer, eps=eps,
        routed=routed, capacity_factor=capacity_factor,
    )


def _apply_sparse_csr(coll, emb, acc, indices, offsets, g_pooled, *, lr,
                      optimizer, eps, routed=False, data_sharded=False,
                      capacity_factor=None):
    """CSR-wire twin of _apply_sparse: the backward of lookup_csr for the
    reference's native indices+offsets shape (emb_host.h:234)."""
    if isinstance(coll, HybridEmbeddingCollection):
        return sparse_update_hybrid_csr(
            coll, emb, acc, indices, offsets, g_pooled,
            lr=lr, optimizer=optimizer, eps=eps,
            routed=routed, data_sharded=data_sharded,
            capacity_factor=capacity_factor,
        )
    return sparse_update_csr(
        coll, emb, acc, indices, offsets, g_pooled,
        lr=lr, optimizer=optimizer, eps=eps,
        routed=routed, data_sharded=data_sharded,
        capacity_factor=capacity_factor,
    )


def make_sparse_train_state(
    model: DLRM, params, *, optimizer: str = "sgd", lr: float = 0.1,
    dense_optimizer: optax.GradientTransformation | None = None,
):
    """Returns (dense_opt, opt_state, acc).  ``params`` stays the single
    source of truth; emb is updated sparsely, bot/top via optax.
    (acc is always allocated — zeros are unused for sgd but keep the step
    signature uniform.)"""
    dense_opt = dense_optimizer or optax.sgd(lr)
    dense_params = {k: params[k] for k in ("bot", "top")}
    opt_state = dense_opt.init(dense_params)
    acc = _init_acc(model.collection)
    return dense_opt, opt_state, acc


def make_sparse_train_step(
    model: DLRM,
    dense_opt: optax.GradientTransformation,
    *,
    lr: float = 0.1,
    optimizer: str = "sgd",  # embedding optimizer: "sgd" | "row_adagrad"
    eps: float = 1e-8,
    routed: bool = False,  # all-to-all id routing for lookup + update
    capacity_factor: float | None = None,
    hot_cache: bool = False,  # step takes (hot_ids, hot_rows) trailing args
) -> Callable:
    """``routed=True`` sends the sharded (big-set) lookup AND the scatter
    update through the all-to-all routing paths, so per-shard gather and
    scatter issue counts scale ~1/M over the model axis — the multi-chip
    scaling composition (SURVEY.md §2c).  Drop-safe at the default
    capacity factor; see EmbeddingCollection.lookup_routed.

    ``hot_cache=True`` (routed only): the step takes two trailing args
    ``(hot_ids [K], hot_rows [K, D])`` — a replicated hot-row snapshot
    (parallel/hotcache.py) that serves zipf-hot entries locally and keeps
    them out of the all-to-all.  The cache goes STALE as updates land;
    the training driver rebuilds it every ``--hot-rebuild-every`` steps
    with ``build_hot_cache`` (cheap: K owner-gathers + one psum).  Passing
    the cache as jit ARGUMENTS (not closure) means rebuilds reuse the same
    compiled step."""
    coll = model.collection
    hybrid = isinstance(coll, HybridEmbeddingCollection)
    if hot_cache and not routed:
        raise ValueError("hot_cache is a routed-lookup feature")

    def _lookup(emb, indices, mask, b, hc):
        if not routed:
            return coll.lookup(emb, indices, mask, batch_size=b)
        if hybrid:
            return coll.lookup(
                emb, indices, mask, batch_size=b, routed=True,
                capacity_factor=capacity_factor, hot_cache=hc,
            )
        return coll.lookup_routed(
            emb, indices, mask, batch_size=b,
            capacity_factor=capacity_factor, hot_cache=hc,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(emb, acc, dense_params, opt_state, dense, indices, mask,
                   labels, *hc_args):
        if bool(hc_args) != hot_cache:
            raise TypeError(
                "step built with hot_cache=%s but got %d trailing cache args"
                % (hot_cache, len(hc_args))
            )
        hc = tuple(hc_args) if hc_args else None
        pooled = _lookup(emb, indices, mask, dense.shape[0], hc)  # [B, T, D]

        def loss_fn(dp, pooled_in):
            logits = model.apply_from_pooled(
                {**dp, "emb": None}, dense, pooled_in
            )
            return bce_loss(logits, labels)

        (loss), (g_dense, g_pooled) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(dense_params, pooled)

        updates, opt_state = dense_opt.update(g_dense, opt_state, dense_params)
        dense_params = optax.apply_updates(dense_params, updates)

        emb, acc = _apply_sparse(
            coll, emb, acc, indices, mask, g_pooled,
            lr=lr, optimizer=optimizer, eps=eps,
            routed=routed, capacity_factor=capacity_factor,
        )
        return emb, acc, dense_params, opt_state, loss

    return train_step
