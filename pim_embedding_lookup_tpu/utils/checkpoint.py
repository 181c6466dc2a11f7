"""Checkpoint save/restore — --save-model / --load-model parity
(README.md:6,10,14; run.sh:118 loads kaggle-model-graham-final.pt).

The reference's persistence is model-level only (the C layer re-pushes
tables at startup, SURVEY.md §5); here the whole train state — sharded
fused embedding table included — round-trips through orbax, each shard
saved/restored by its owning device.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template: Any) -> Any:
    """Restore into the shardings/structure of ``template`` (an abstract or
    concrete pytree matching what was saved)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        template,
    )
    restored = ckptr.restore(path, abstract)
    # re-pin every leaf to the template's sharding so device sets stay
    # consistent (orbax restores unsharded leaves committed to one device)
    def repin(r, t):
        sh = getattr(t, "sharding", None)
        return jax.device_put(r, sh) if sh is not None else r

    return jax.tree.map(repin, restored, template)
