"""Synthetic query/batch generation.

Capability parity with two reference components:
* the standalone C load generator (upmem/src/load_generator.c:81-93:
  uniform-random indices, fixed 32-per-bag stride offsets, NR_ROWS=50000,
  128 batches), and
* dlrm's --data-generation=random mode (run.sh:72-82: random dense features
  + random multi-hot indices, num-indices-per-lookup).

Adds a zipf (power-law) mode — real recommendation ID streams are zipfian,
and hot-row skew is what stresses ROW sharding (SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np

from ..config import DLRMConfig, QueryConfig, TableConfig


@dataclasses.dataclass
class QueryGenerator:
    """Generates padded multi-hot queries for a table collection.

    distribution: "uniform" | "zipf" (alpha parameterizes skew).
    """

    tables: Sequence[TableConfig]
    query: QueryConfig
    distribution: str = "uniform"
    zipf_alpha: float = 1.05
    seed: int = 0
    fixed_length: bool = True  # reference pads all bags to max (emb_host.h:30)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)
        # zipf over [0, n): draw ranks then map; precompute nothing heavy
        self._t = len(self.tables)

    def _draw_indices(self, num_rows: int, shape) -> np.ndarray:
        if self.distribution == "uniform":
            return self._rng.integers(0, num_rows, size=shape, dtype=np.int64)
        if self.distribution == "zipf":
            # bounded zipf via inverse-CDF on a truncated harmonic series
            z = self._rng.zipf(self.zipf_alpha, size=shape)
            return np.minimum(z - 1, num_rows - 1)
        raise ValueError(self.distribution)

    def _draw_all(self, b: int, l: int) -> np.ndarray:
        """[T, B, L] int32 — native C++ feeder when built (multi-threaded,
        load_generator.c parity path), numpy fallback otherwise."""
        from ..utils import native

        if native.available():
            out = native.gen_query(
                np.asarray([t.num_rows for t in self.tables], np.int64),
                b, l,
                distribution=self.distribution,
                alpha=self.zipf_alpha,
                seed=int(self._rng.integers(0, 2**31 - 1)),
            )
            return out.astype(np.int32)
        return np.stack(
            [self._draw_indices(t.num_rows, (b, l)) for t in self.tables]
        ).astype(np.int32)

    def next_query(self) -> tuple[np.ndarray, np.ndarray]:
        """-> indices [T, B*L] int32, mask [T, B*L] bool (flat (batch, slot)
        order — the 2-D wire format of EmbeddingCollection.lookup)."""
        b, l = self.query.batch_size, self.query.max_indices_per_batch
        idx = self._draw_all(b, l)
        if self.fixed_length:
            mask = np.ones((self._t, b, l), dtype=bool)
        else:
            lengths = self._rng.integers(1, l + 1, size=(self._t, b))
            mask = np.arange(l)[None, None, :] < lengths[..., None]
        return idx.reshape(self._t, b * l), mask.reshape(self._t, b * l)

    def queries(self, n: int) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        for _ in range(n):
            yield self.next_query()


def random_tables(
    tables: Sequence[TableConfig], seed: int = 0, scale: float = 1.0
) -> list[np.ndarray]:
    """Random float tables (synthetic_populate parity, load_generator.c:27-38
  fills tables with rand()/RAND_MAX floats)."""
    rng = np.random.default_rng(seed)
    return [
        (rng.random((t.num_rows, t.dim), dtype=np.float32) * scale) for t in tables
    ]


@dataclasses.dataclass
class SyntheticDLRMBatches:
    """Random DLRM training batches: dense features + multi-hot queries +
    bernoulli labels (dlrm --data-generation=random, run.sh:77)."""

    config: DLRMConfig
    batch_size: int
    indices_per_lookup: int
    num_batches: int
    seed: int = 0
    distribution: str = "uniform"

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        gen = QueryGenerator(
            self.config.tables,
            QueryConfig(self.batch_size, self.indices_per_lookup),
            distribution=self.distribution,
            seed=self.seed + 1,
        )
        for _ in range(self.num_batches):
            dense = rng.random((self.batch_size, self.config.dense_dim)).astype(
                np.float32
            )
            idx, mask = gen.next_query()
            labels = (rng.random(self.batch_size) < 0.5).astype(np.float32)
            yield dense, idx, mask, labels
