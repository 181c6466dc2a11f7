"""Checkpoint save/restore — --save-model / --load-model parity
(README.md:6,10,14; run.sh:118 loads kaggle-model-graham-final.pt).

The reference's persistence is model-level only (the C layer re-pushes
tables at startup, SURVEY.md §5); here the whole train state — sharded
fused embedding table included — round-trips through orbax, each shard
saved/restored by its owning device.

Layout identity: the fused embedding array's STORAGE ORDER depends on the
planner decision (policy, lane-pack factor, padded row count, per-table
offsets).  Two different layouts can share one array shape — e.g. a
contiguous ROW fused table reinterpreted as strided ROW_HASH passes every
shape check and silently returns wrong rows on every lookup.  So `save`
writes a layout fingerprint next to the weights and `restore` refuses a
mismatch (ADVICE r1 medium finding).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

_META_NAME = "pim_layout.json"


def _layout_fingerprint(lay) -> dict:
    return {
        "policy": str(lay.policy.value),
        "pack": int(lay.pack),
        "dim": int(lay.dim),
        "num_shards": int(lay.num_shards),
        "total_rows": int(lay.total_rows),
        "row_offsets": [int(o) for o in lay.row_offsets],
        "table_rows": [int(r) for r in lay.table_rows],
    }


def collection_meta(coll) -> dict:
    """Layout fingerprint for an EmbeddingCollection or
    HybridEmbeddingCollection (identifies the storage order of every fused
    array in the params pytree)."""
    if hasattr(coll, "layout"):
        return {"kind": "collection", "layout": _layout_fingerprint(coll.layout)}
    # hybrid: two sub-collections + the split itself
    return {
        "kind": "hybrid",
        "small_ids": [int(i) for i in coll.small_ids],
        "big_ids": [int(i) for i in coll.big_ids],
        "small": _layout_fingerprint(coll.small.layout) if coll.small else None,
        "big": _layout_fingerprint(coll.big.layout) if coll.big else None,
    }


def save(path: str, state: Any, *, meta: dict | None = None) -> None:
    """``meta``: optional layout fingerprint (collection_meta) persisted
    alongside the weights and validated on restore."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(os.path.join(path, _META_NAME), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)


def saved_meta(path: str) -> dict | None:
    mp = os.path.join(os.path.abspath(path), _META_NAME)
    if not os.path.exists(mp):
        return None
    with open(mp) as f:
        return json.load(f)


def validate_meta(path: str, expect_meta: dict) -> None:
    """Raise if the checkpoint's layout fingerprint contradicts
    ``expect_meta`` (subset match over expect_meta's keys)."""
    found = saved_meta(os.path.abspath(path))
    if found is not None and any(
        found.get(k) != v for k, v in expect_meta.items()
    ):
        raise ValueError(
            f"checkpoint layout mismatch at {path}: "
            f"{_meta_diff(found, expect_meta)} — the saved fused table's "
            "storage order differs from this collection's plan; rebuild the "
            "collection with the saved layout (policy/pack/shards) or "
            "re-export the checkpoint"
        )


def restore_raw(path: str) -> Any:
    """Restore the raw saved pytree (host-side numpy, no template) — for
    picking a sub-tree (e.g. params) out of a full-train-state checkpoint.
    Materializes on host: fine for model export/inference bring-up, not for
    resuming 100M-row sharded tables (use ``restore`` with a template)."""
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def pin_like(tree: Any, template: Any) -> Any:
    """device_put every leaf of ``tree`` to the matching template leaf's
    sharding (host numpy -> correctly sharded jax.Array)."""

    def pin(r, t):
        sh = getattr(t, "sharding", None)
        return jax.device_put(r, sh) if sh is not None else r

    return jax.tree.map(pin, tree, template)


def restore(path: str, template: Any, *, expect_meta: dict | None = None) -> Any:
    """Restore into the shardings/structure of ``template`` (an abstract or
    concrete pytree matching what was saved).

    ``expect_meta``: the CURRENT collection's layout fingerprint
    (collection_meta).  If the checkpoint carries metadata, every key in
    ``expect_meta`` must match it — a same-shape array in a different
    storage order (other policy/pack/striding) would silently return wrong
    rows on every lookup.  Checkpoints without metadata (pre-r2) restore
    with no check."""
    path = os.path.abspath(path)
    if expect_meta is not None:
        validate_meta(path, expect_meta)
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


def _meta_diff(found: dict, expect: dict) -> str:
    keys = sorted(set(found) | set(expect))
    bad = [k for k in keys if found.get(k) != expect.get(k)]
    return ", ".join(
        f"{k}: saved={found.get(k)!r} vs current={expect.get(k)!r}" for k in bad
    )
