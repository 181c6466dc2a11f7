"""pim_embedding_lookup_tpu — TPU-native sharded embedding-lookup engine.

A from-scratch re-design of the capabilities of
UBC-ECE-Sasha/PIM-Embedding-Lookup (UPMEM processing-in-memory DLRM embedding
offload) for TPU: Pallas fused gather+pool kernels, mesh-sharded tables
(row / column / table-wise / replicated), a JAX DLRM (dense MLPs + dot
interaction), BCE training with sparse-grad scatter-add, and the reference's
benchmarking/profiling surface (phase timers, interval CSVs, sweep grids).

See SURVEY.md at the repo root for the capability map into the reference.
"""

from . import config, ops
from .config import (
    Combiner,
    DLRMConfig,
    LookupImpl,
    MeshConfig,
    QueryConfig,
    ShardingPolicy,
    TableConfig,
    kaggle_config,
    loadgen_config,
    random_config,
    toy_config,
)
from .ops import embedding_bag

__version__ = "0.1.0"
