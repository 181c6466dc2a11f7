"""Length-bucketed CSR dispatch: ragged bags -> a few fixed-L dense
lookups + a residual CSR tail, merged by a per-batch-element scatter.

Why: the CSR segment reduce pays its raggedness tax per dispatch and it is
worst at narrow dims (2.2x over fixed-L dense at the reference's dim-16
canonical shape — docs/PERF.md "Residual CSR tax by shape").  The
reference's own answer to raggedness is host-side padding to a fixed L
(emb_host.h:30,262); this is the shape-adaptive version: ops/ragged.py's
host packer groups batch elements by max bag length into static fixed-L
buckets, each bucket rides the measured-fast dense kernel (hybrid MXU +
lane-packed gather included), and only genuinely long bags pay the
segment reduce.

Merge cost note (measured on chip): positions are per BATCH ELEMENT and
shared across tables, so the merge scatters at most ~B rows of [T*D]
lanes — and is a free slice when the pack is the identity (fixed-L wire).
An earlier per-(table, bag) merge scattered B*T narrow rows and its
per-row issue cost (~10ns each at 213k rows) ate the entire dense-kernel
win; never merge at entry granularity on this hardware.

Works with any collection exposing ``lookup``/``lookup_csr`` with the
standard signatures: EmbeddingCollection, HybridEmbeddingCollection,
QuantizedEmbeddingCollection (the int8 per-table scale fold happens inside
its lookup wrappers, so the merge sees final-unit rows).

Merge correctness: every batch element with entries occupies exactly ONE
bucket slot (or tail slot), so a position-scatter SET is exact for every
combiner; all-empty elements keep the zero initial value (torch
EmbeddingBag parity).  Unused slots carry sentinel position ``batch`` and
land in a sliced-off sentinel row.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ragged import BucketedCSR


def lookup_csr_bucketed(
    coll,
    params,
    packed: BucketedCSR,
    *,
    combiner: str = "sum",
) -> jnp.ndarray:  # [B, T, D] f32
    """Dispatch a host-packed BucketedCSR through ``coll`` and merge.

    ``packed`` arrays may be numpy (jnp.asarray'd here) or pre-staged
    device arrays with the same shapes.  One compile per (plan, coll)
    thanks to static plan shapes.
    """
    plan = packed.plan
    b = plan.batch
    parts = []  # (pooled [Bk, T, D], pos [Bk])

    for k, l in enumerate(plan.bucket_ls):
        if plan.capacities[k] == 0:
            continue
        pooled = coll.lookup(
            params,
            jnp.asarray(packed.idx[k]),
            jnp.asarray(packed.mask[k]),
            batch_size=plan.capacities[k],
            combiner=combiner,
        )
        parts.append((pooled, jnp.asarray(packed.pos[k])))

    if packed.identity and parts:
        # fixed-L fast path: slot j IS batch element j — return before the
        # tail dispatch (identity implies the tail is unused this batch;
        # dispatching the all-sentinel tail would waste a full CSR call)
        return parts[0][0][:b]

    if plan.tail_bags:
        pooled = coll.lookup_csr(
            params,
            jnp.asarray(packed.tail_idx),
            jnp.asarray(packed.tail_off),
            combiner=combiner,
        )
        parts.append((pooled, jnp.asarray(packed.tail_pos)))

    if not parts:
        raise ValueError("bucketed CSR with all-zero capacities")

    t, d = parts[0][0].shape[1], parts[0][0].shape[2]
    out_flat = jnp.zeros((b + 1, t * d), parts[0][0].dtype)
    for pooled, pos in parts:
        bk = pooled.shape[0]
        out_flat = out_flat.at[pos].set(
            pooled.reshape(bk, t * d), mode="drop"
        )
    return out_flat[:b].reshape(b, t, d)
