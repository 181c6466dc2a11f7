"""Single-shard embedding-bag kernels (gather + pool) and helpers."""

from __future__ import annotations

import jax

from ..config import Combiner, LookupImpl
from .fixedpoint import SCALE, decode, embedding_bag_fixed_point, encode
from .lookup import embedding_bag_csr, embedding_bag_dense, embedding_bag_onehot
from .pallas_lookup import pallas_embedding_bag_csr
from .ragged import (
    bag_lengths,
    csr_to_dense,
    dense_to_csr,
    pack_bags,
    segment_ids_from_offsets,
)

# Tables at or below this many rows run the one-hot MXU path when impl=AUTO.
ONEHOT_ROW_THRESHOLD = 2048


def embedding_bag(
    table: jax.Array,
    indices: jax.Array,
    offsets: jax.Array,
    *,
    batch_size: int,
    combiner: Combiner = Combiner.SUM,
    impl: LookupImpl = LookupImpl.AUTO,
) -> jax.Array:
    """Pooled embedding lookup on one shard — impl-dispatching facade.

    This is the per-device unit of work that the reference assigns to one DPU
    (emb_dpu_lookup.c main); the parallel layer composes it over the mesh.
    """
    impl = LookupImpl(impl)
    combiner = Combiner(combiner)
    if impl == LookupImpl.AUTO:
        if (
            combiner == Combiner.SUM
            and table.shape[0] <= ONEHOT_ROW_THRESHOLD
            and table.ndim == 2
        ):
            impl = LookupImpl.ONEHOT
        else:
            impl = LookupImpl.JNP
    if impl == LookupImpl.ONEHOT:
        if combiner != Combiner.SUM:
            raise NotImplementedError("onehot path supports SUM only")
        return embedding_bag_onehot(table, indices, offsets, batch_size=batch_size)
    if impl == LookupImpl.PALLAS:
        if combiner == Combiner.SUM:
            return pallas_embedding_bag_csr(
                table, indices, offsets, batch_size=batch_size
            )
        if combiner == Combiner.MEAN:
            pooled = pallas_embedding_bag_csr(
                table, indices, offsets, batch_size=batch_size
            )
            lengths = bag_lengths(offsets).astype(pooled.dtype)
            import jax.numpy as jnp

            return pooled / jnp.maximum(lengths, 1)[:, None]
        raise NotImplementedError("pallas path supports SUM/MEAN")
    return embedding_bag_csr(
        table, indices, offsets, batch_size=batch_size, combiner=combiner
    )


__all__ = [
    "Combiner",
    "LookupImpl",
    "embedding_bag",
    "embedding_bag_csr",
    "embedding_bag_dense",
    "embedding_bag_onehot",
    "embedding_bag_fixed_point",
    "pallas_embedding_bag_csr",
    "encode",
    "decode",
    "SCALE",
    "pack_bags",
    "dense_to_csr",
    "csr_to_dense",
    "bag_lengths",
    "segment_ids_from_offsets",
    "ONEHOT_ROW_THRESHOLD",
]
