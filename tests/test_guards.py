"""Failure-detection tests: NaN guards and checkpoint-restart."""

import jax.numpy as jnp
import numpy as np
import pytest

from pim_embedding_lookup_tpu.utils.guards import (
    NonFiniteError,
    check_finite,
    finite_or_skip_update,
    train_with_restart,
)


def test_check_finite_raises():
    check_finite({"a": jnp.ones(3)}, "params")
    with pytest.raises(NonFiniteError) as e:
        check_finite({"a": jnp.ones(3), "b": jnp.asarray([1.0, np.nan])}, "params")
    assert "b" in str(e.value)


def test_finite_or_skip_update():
    old = {"w": jnp.zeros(2)}
    new = {"w": jnp.ones(2)}
    kept = finite_or_skip_update(new, old, jnp.asarray(0.5))
    np.testing.assert_array_equal(np.asarray(kept["w"]), [1, 1])
    skipped = finite_or_skip_update(new, old, jnp.asarray(np.nan))
    np.testing.assert_array_equal(np.asarray(skipped["w"]), [0, 0])


def test_train_with_restart_rolls_back():
    saves = {}
    calls = {"n": 0}

    def run_steps(state, n):
        calls["n"] += 1
        if calls["n"] == 2:  # second chunk poisons
            raise NonFiniteError("loss")
        return state + n, 0.1

    result = train_with_restart(
        run_steps,
        save=lambda s, step: saves.__setitem__(step, s),
        restore=lambda step: saves[step],
        state=0,
        total_steps=30,
        checkpoint_every=10,
    )
    assert result == 30
    # chunk2 failed once -> 4 successful chunks + 1 failed = 5 calls
    assert calls["n"] == 4
    assert set(saves) == {0, 10, 20, 30}


def test_train_with_restart_gives_up():
    def run_steps(state, n):
        raise NonFiniteError("loss")

    with pytest.raises(NonFiniteError):
        train_with_restart(
            run_steps,
            save=lambda s, step: None,
            restore=lambda step: 0,
            state=0,
            total_steps=10,
            checkpoint_every=5,
            max_restarts=2,
        )
