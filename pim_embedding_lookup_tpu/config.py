"""Runtime configuration for the TPU-native embedding engine.

The reference (UBC-ECE-Sasha/PIM-Embedding-Lookup) bakes every shape into the
toolchain at compile time via -D defines (upmem/Makefile:69-81: NR_TABLES,
NR_COLS, MAX_NR_BATCHES, MAX_INDICES_PER_BATCH, NR_TASKLETS) and env-var
presets per dataset (upmem/run.sh:40-56, r.sh:6-10).  On TPU, shapes are
jit-trace-time properties, so the whole three-tier config system collapses
into these dataclasses; the presets below mirror the reference's named
configurations one-for-one.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Sequence

import jax.numpy as jnp


class Combiner(str, enum.Enum):
    """Bag pooling mode.  The reference only implements SUM
    (upmem/src/dpu/emb_dpu_lookup.c:114 accumulates int32 sums); MEAN/MAX are
    standard EmbeddingBag modes provided for model-layer parity."""

    SUM = "sum"
    MEAN = "mean"
    MAX = "max"


class ShardingPolicy(str, enum.Enum):
    """How a table is laid out over the mesh's ``model`` axis.

    The reference's single strategy is one DPU per (table, column) pair
    (emb_host.h:157 ``dpu_alloc(NR_COLS*NR_TABLES)``, :167 dpu id
    ``table_id*NR_COLS+col``) — i.e. TABLE_WISE placement combined with
    COLUMN sharding.  ROW sharding was planned but dead scaffolding there
    (emb_types.h:15-19, emb_host.h:124-134); here it is real.
    """

    REPLICATE = "replicate"  # whole table on every model-shard
    ROW = "row"              # contiguous row ranges per shard + psum merge
    ROW_HASH = "row_hash"    # strided rows (owner = id % shards): balances
                             # ownership of every table >= shards rows, the
                             # fix for power-law/layout skew (SURVEY.md §7c)
    COLUMN = "column"        # dim split per shard + concat/all-gather merge
    TABLE_WISE = "table_wise"  # whole tables round-robined over shards
    AUTO = "auto"            # planner decides per table


class LookupImpl(str, enum.Enum):
    """Which kernel computes gather+pool on a shard."""

    JNP = "jnp"          # XLA take + segment_sum (baseline oracle path)
    ONEHOT = "onehot"    # one-hot x table matmul on the MXU (small tables)
    PALLAS = "pallas"    # fused DMA-gather + pool Mosaic kernel
    AUTO = "auto"        # pick by table size / dim


@dataclasses.dataclass(frozen=True)
class TableConfig:
    """One embedding table.

    Mirrors what the reference spreads across ``--arch-embedding-size`` (the
    per-table row counts, run.sh:73) and ``NR_COLS`` (the shared dim,
    run.sh:41).
    """

    num_rows: int
    dim: int
    name: str = ""
    combiner: Combiner = Combiner.SUM
    dtype: jnp.dtype = jnp.float32
    # Per-table override; AUTO defers to the planner.
    sharding: ShardingPolicy = ShardingPolicy.AUTO

    @property
    def bytes(self) -> int:
        return self.num_rows * self.dim * jnp.dtype(self.dtype).itemsize


@dataclasses.dataclass(frozen=True)
class QueryConfig:
    """Static query shape for one jit trace.

    The analog of the reference's MAX_NR_BATCHES / MAX_INDICES_PER_BATCH
    padding contract (emb_host.h:30 ``INDICES_LEN = MAX_INDICES_PER_BATCH *
    MAX_NR_BATCHES``; indices are always pushed at full padded size,
    emb_host.h:258-263).
    """

    batch_size: int
    max_indices_per_batch: int

    @property
    def capacity(self) -> int:
        """Flat padded index capacity per table (CSR buffer length)."""
        return self.batch_size * self.max_indices_per_batch


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh.  ``data`` is the batch/DP axis, ``model`` the
    table-sharding axis — the TPU replacement for the reference's flat fleet
    of NR_COLS*NR_TABLES DPUs grouped 64-per-rank (emb_types.h:6-7)."""

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclasses.dataclass(frozen=True)
class DLRMConfig:
    """Full DLRM architecture (dense + sparse halves).

    Defaults reproduce the reference's canonical Criteo-Kaggle run
    (README.md:6): bot MLP 13-512-256-64-16, top 512-256-1, 26 tables x dim 16.
    """

    dense_dim: int
    mlp_bot: Sequence[int]
    mlp_top: Sequence[int]
    tables: Sequence[TableConfig]
    interaction: str = "dot"  # "dot" | "cat"
    interact_itself: bool = False
    sigmoid_top: bool = True  # apply sigmoid at the final layer (loss uses logits)

    @property
    def sparse_dim(self) -> int:
        dims = {t.dim for t in self.tables}
        if len(dims) != 1:
            raise ValueError(f"DLRM dot interaction needs equal dims, got {dims}")
        return next(iter(dims))

    @property
    def num_tables(self) -> int:
        return len(self.tables)


# ---------------------------------------------------------------------------
# Presets mirroring the reference run configurations
# ---------------------------------------------------------------------------

# Criteo Kaggle categorical cardinalities (facebookresearch/dlrm processed
# kaggleAdDisplayChallenge_processed.npz counts). The reference selects this
# workload via kaggle_env: NR_TABLES=26, NR_COLS=16 (run.sh:40-45).
KAGGLE_TABLE_ROWS = (
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145,
    5683, 8351593, 3194, 27, 14992, 5461306, 10, 5652, 2173, 4,
    7046547, 18, 15, 286181, 105, 142572,
)


def kaggle_config(dim: int = 16) -> DLRMConfig:
    """README.md:6 canonical config: 26 Criteo tables, dim 16."""
    tables = tuple(
        TableConfig(num_rows=n, dim=dim, name=f"cat_{i}")
        for i, n in enumerate(KAGGLE_TABLE_ROWS)
    )
    return DLRMConfig(
        dense_dim=13,
        mlp_bot=(512, 256, 64, dim),
        mlp_top=(512, 256, 1),
        tables=tables,
    )


def random_config(
    num_tables: int = 32, rows: int = 500_000, dim: int = 64
) -> DLRMConfig:
    """random_env preset (r.sh:6-10): 32 tables x 500k rows x dim 64."""
    tables = tuple(
        TableConfig(num_rows=rows, dim=dim, name=f"rand_{i}")
        for i in range(num_tables)
    )
    return DLRMConfig(
        dense_dim=13,
        mlp_bot=(512, 256, dim),
        mlp_top=(512, 256, 1),
        tables=tables,
    )


def toy_config(num_tables: int = 9, rows: int = 64, dim: int = 64) -> DLRMConfig:
    """toy_env preset (run.sh:93-101): 9 tables, dim 64, tiny rows."""
    tables = tuple(
        TableConfig(num_rows=rows, dim=dim, name=f"toy_{i}")
        for i in range(num_tables)
    )
    return DLRMConfig(
        dense_dim=4,
        mlp_bot=(8, dim),
        mlp_top=(16, 1),
        tables=tables,
    )


def loadgen_config(num_tables: int = 8, rows: int = 50_000, dim: int = 16):
    """Standalone benchmark shapes (load_generator.c:124-137: NR_ROWS=50000,
    128 batches, 32 indices/bag)."""
    tables = tuple(
        TableConfig(num_rows=rows, dim=dim, name=f"lg_{i}")
        for i in range(num_tables)
    )
    return tables, QueryConfig(batch_size=128, max_indices_per_batch=32)
