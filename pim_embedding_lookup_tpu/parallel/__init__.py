"""Mesh construction, table placement planning, and sharded lookup."""

from .bucketed import lookup_csr_bucketed
from .collection import EmbeddingCollection
from .hybrid import HybridEmbeddingCollection
from .quantized_collection import QuantizedEmbeddingCollection
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    col_sharded,
    make_mesh,
    replicated,
    row_sharded,
    shard_count,
)
from .planner import FusedLayout, plan

__all__ = [
    "lookup_csr_bucketed",
    "EmbeddingCollection",
    "HybridEmbeddingCollection",
    "QuantizedEmbeddingCollection",
    "FusedLayout",
    "plan",
    "make_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "replicated",
    "batch_sharded",
    "row_sharded",
    "col_sharded",
    "shard_count",
]
