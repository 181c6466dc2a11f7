"""Failure detection: NaN/Inf guards + checkpoint-restart helper.

The reference has no failure handling beyond DPU_ASSERT abort
(emb_host.h:157-368; SURVEY.md §5 'failure detection: absent').  The TPU
build adds the basics called for in the survey: finite-ness checks on
losses/params that raise early, and a resumable-train wrapper that rolls
back to the last checkpoint when a step produces non-finite state.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


class NonFiniteError(RuntimeError):
    def __init__(self, where: str):
        super().__init__(f"non-finite value detected in {where}")
        self.where = where


def check_finite(value: Any, where: str = "value") -> None:
    """Raise NonFiniteError if any leaf contains NaN/Inf (host-side check;
    call sparingly — it synchronizes)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(value)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise NonFiniteError(f"{where}{jax.tree_util.keystr(path)}")


def finite_or_skip_update(new: Any, old: Any, loss: jax.Array) -> Any:
    """Jit-compatible guard: if loss is non-finite, keep the old state
    (skip the poisoned update) — lets training ride through a bad batch."""
    ok = jnp.isfinite(loss)
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)


def train_with_restart(
    run_steps: Callable[[Any, int], tuple[Any, float]],
    save: Callable[[Any, int], None],
    restore: Callable[[int], Any],
    state: Any,
    *,
    total_steps: int,
    checkpoint_every: int,
    max_restarts: int = 3,
) -> Any:
    """Checkpoint/restart driver: run ``run_steps(state, n)`` in
    checkpoint_every chunks; on NonFiniteError roll back to the last save.

    run_steps returns (state, last_loss) and should itself raise
    NonFiniteError (e.g. via check_finite on the loss) on poisoned state.
    """
    done = 0
    restarts = 0
    save(state, 0)
    last_ckpt = 0
    while done < total_steps:
        n = min(checkpoint_every, total_steps - done)
        try:
            state, loss = run_steps(state, n)
            check_finite(loss, "loss")
            done += n
            save(state, done)
            last_ckpt = done
        except NonFiniteError:
            restarts += 1
            if restarts > max_restarts:
                raise
            state = restore(last_ckpt)
            done = last_ckpt
    return state
