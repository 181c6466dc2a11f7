"""Training loop: BCE + SGD, accuracy/AUC metrics, jitted train/eval steps.

Parity surface (reference README.md:10): mini-batch 188, SGD lr 0.1, BCE,
test accuracy/AUC every --test-freq batches, 20 epochs on Criteo Kaggle.
The reference's C layer is inference-only (no backward anywhere in
upmem/src); the training path here closes that gap with sparse scatter-add
gradients flowing through the sharded lookup (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .dlrm import DLRM, Params, bce_loss


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: int


def make_optimizer(lr: float = 0.1, kind: str = "sgd") -> optax.GradientTransformation:
    """--learning-rate=0.1 SGD default (README.md:10); adagrad is upstream
    dlrm's other standard choice for sparse features."""
    if kind == "sgd":
        return optax.sgd(lr)
    if kind == "adagrad":
        return optax.adagrad(lr)
    raise ValueError(kind)


def make_train_step(
    model: DLRM, optimizer: optax.GradientTransformation
) -> Callable:
    @jax.jit
    def train_step(params, opt_state, dense, indices, mask, labels):
        def loss_fn(p):
            logits = model.apply(p, dense, indices, mask)
            return bce_loss(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    return train_step


def make_eval_step(model: DLRM) -> Callable:
    @jax.jit
    def eval_step(params, dense, indices, mask):
        return jax.nn.sigmoid(model.apply(params, dense, indices, mask))

    return eval_step


def binary_accuracy(probs: np.ndarray, labels: np.ndarray) -> float:
    return float(np.mean((probs > 0.5) == (labels > 0.5)))


def roc_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney), no sklearn dependency.

    The metric the reference harness reports for Criteo parity
    (README.md:10 --mlperf-logging prints test AUC)."""
    order = np.argsort(probs, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_p = probs[order]
    # average ranks for ties
    i = 0
    n = len(probs)
    while i < n:
        j = i
        while j + 1 < n and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    pos = labels > 0.5
    npos = int(pos.sum())
    nneg = n - npos
    if npos == 0 or nneg == 0:
        return float("nan")
    return float((ranks[pos].sum() - npos * (npos + 1) / 2) / (npos * nneg))


@dataclasses.dataclass
class TrainReport:
    step: int
    loss: float
    accuracy: float
    auc: float


def fit(
    model: DLRM,
    params: Params,
    batches: Iterator,
    *,
    lr: float = 0.1,
    optimizer_kind: str = "sgd",
    test_freq: int = 0,
    test_batches: list | None = None,
    log_fn: Callable[[TrainReport], None] | None = None,
) -> tuple[Params, list[TrainReport]]:
    """Train over an iterator of (dense, indices, mask, labels) host batches.

    test_freq mirrors --test-freq=209 (README.md:10): evaluate on the held
    set every N steps.
    """
    optimizer = make_optimizer(lr, optimizer_kind)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer)
    eval_step = make_eval_step(model)
    reports: list[TrainReport] = []
    step = 0
    for dense, indices, mask, labels in batches:
        params, opt_state, loss, logits = train_step(
            params, opt_state, dense, indices, mask, labels
        )
        step += 1
        if test_freq and step % test_freq == 0 and test_batches:
            probs, labs = [], []
            for tdense, tindices, tmask, tlabels in test_batches:
                probs.append(np.asarray(eval_step(params, tdense, tindices, tmask)))
                labs.append(np.asarray(tlabels))
            probs, labs = np.concatenate(probs), np.concatenate(labs)
            rep = TrainReport(
                step=step,
                loss=float(loss),
                accuracy=binary_accuracy(probs, labs),
                auc=roc_auc(probs, labs),
            )
            reports.append(rep)
            if log_fn:
                log_fn(rep)
    return params, reports
