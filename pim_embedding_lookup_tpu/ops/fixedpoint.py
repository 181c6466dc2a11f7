"""Fixed-point int32 embedding mode — bitwise-parity path with the reference.

UPMEM DPUs have no FPU, so the reference stores tables as ``float * 1e9``
int32 (the DLRM side quantises before populate_mram; the decode is
``final_results[...] = tmp / 1e9`` in the post_process callback,
emb_host.h:207-212) and pools with wrap-around int32 adds on-device
(emb_dpu_lookup.c:114).  TPUs have perfectly good float units, so the
production path is fp32/bf16 — this module exists so tests can reproduce the
reference's numerics exactly (same encode, same int32 wraparound sum, same
decode) and so the CPU-oracle tolerance contract of validate_result
(load_generator.c:58: |int_result - expected| <= 1000 fixed-point units) can
be checked against our kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ragged import segment_ids_from_offsets

SCALE = 1e9  # emb_host.h:210


def encode(x: jax.Array, scale: float = SCALE) -> jax.Array:
    """float -> int32 fixed point (C cast semantics: truncation toward zero)."""
    return jnp.trunc(x * scale).astype(jnp.int32)


def decode(x: jax.Array, scale: float = SCALE) -> jax.Array:
    """int32 fixed point -> float (emb_host.h:210 `/ 1e9`)."""
    return x.astype(jnp.float32) / scale


@functools.partial(jax.jit, static_argnames=("batch_size", "decode_output"))
def embedding_bag_fixed_point(
    table_i32: jax.Array,  # [N, D] int32 encoded
    indices: jax.Array,  # [C]
    offsets: jax.Array,  # [B+1]
    *,
    batch_size: int,
    decode_output: bool = True,
) -> jax.Array:  # [B, D] float32 decoded (or raw int32 sums)
    """SUM-pool in int32 with wraparound, then decode — exactly the DPU
    kernel's arithmetic (emb_dpu_lookup.c:114 int32 accumulate, then host-side
    /1e9).  ``decode_output=False`` returns the raw int32 sums (the "results"
    MRAM symbol contents before post_process) for bitwise parity checks."""
    capacity = indices.shape[0]
    seg_ids = segment_ids_from_offsets(offsets, capacity)
    rows = jnp.take(table_i32, indices, axis=0)
    rows = jnp.where((seg_ids < batch_size)[:, None], rows, 0)
    pooled = jax.ops.segment_sum(
        rows, seg_ids, num_segments=batch_size + 1, indices_are_sorted=True
    )[:batch_size]
    return decode(pooled) if decode_output else pooled
