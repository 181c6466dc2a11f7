"""Length-bucketed CSR dispatch: ragged bags -> a few fixed-L dense
lookups + a residual CSR tail, merged by a batch-position scatter.

Why: the CSR segment reduce pays its raggedness tax per dispatch and it is
worst at narrow dims (2.2x over fixed-L dense at the reference's dim-16
canonical shape — docs/PERF.md "Residual CSR tax by shape").  The
reference's own answer to raggedness is host-side padding to a fixed L
(emb_host.h:30,262); this is the shape-adaptive version: ops/ragged.py's
host packer groups bags by length into static fixed-L buckets, each bucket
rides the measured-fast dense kernel (hybrid MXU + lane-packed gather
included), and only genuinely long bags pay the segment reduce.

Works with any collection exposing ``lookup``/``lookup_csr`` with the
standard signatures: EmbeddingCollection, HybridEmbeddingCollection,
QuantizedEmbeddingCollection (the int8 per-table scale fold happens inside
its lookup wrappers, so bucketed merge sees final-unit rows).

Merge correctness: every non-empty bag is packed into exactly ONE bucket
slot (or the tail), so a position-scatter SET is exact for every combiner;
empty bags are never packed and keep the zero initial value (torch
EmbeddingBag parity).  Pad slots carry sentinel position ``batch`` and
land in a sliced-off sentinel row.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ragged import BucketedCSR


def _scatter_pooled(out_flat, pooled, pos, t):
    """out_flat [(B+1)*T, D] <- pooled [Bk, T, D] at positions pos [T, Bk]
    (sentinel B for pad slots -> the sliced-off sentinel rows)."""
    bk = pooled.shape[0]
    pflat = (jnp.transpose(pos, (1, 0)) * t
             + jnp.arange(t, dtype=pos.dtype)[None, :]).reshape(-1)  # [Bk*T]
    return out_flat.at[pflat].set(
        pooled.reshape(bk * t, -1), mode="drop"
    )


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
    t = packed.pos[0].shape[0] if packed.pos else packed.tail_pos.shape[0]
    d = None
    out_flat = None

    for k, l in enumerate(plan.bucket_ls):
        if plan.capacities[k] == 0:
            continue
        pooled = coll.lookup(
            params,
            jnp.asarray(packed.idx[k]),
            jnp.asarray(packed.mask[k]),
            batch_size=plan.capacities[k],
            combiner=combiner,
        )  # [Bk, T, D]
        if out_flat is None:
            d = pooled.shape[-1]
            out_flat = jnp.zeros(((b + 1) * t, d), pooled.dtype)
        out_flat = _scatter_pooled(
            out_flat, pooled, jnp.asarray(packed.pos[k]), t
        )

    if plan.tail_bags:
        pooled = coll.lookup_csr(
            params,
            jnp.asarray(packed.tail_idx),
            jnp.asarray(packed.tail_off),
            combiner=combiner,
        )  # [tail_bags, T, D]
        if out_flat is None:
            d = pooled.shape[-1]
            out_flat = jnp.zeros(((b + 1) * t, d), pooled.dtype)
        out_flat = _scatter_pooled(
            out_flat, pooled, jnp.asarray(packed.tail_pos), t
        )

    if out_flat is None:  # every bag empty
        raise ValueError("bucketed CSR with all-zero capacities")
    return out_flat.reshape(b + 1, t, d)[:b]
