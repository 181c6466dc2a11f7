"""Device mesh construction.

The TPU replacement for the reference's flat DPU fleet: dpu_alloc of
NR_COLS*NR_TABLES DPUs grouped 64-per-rank (emb_host.h:155-160,
emb_types.h:6-7) becomes a logical 2-D mesh ("data", "model") over whatever
chips are present; XLA routes collectives over ICI/DCN according to the
physical topology.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def check_vma_enabled() -> bool:
    """Debug re-enable of shard_map's replication checker.

    A few dispatches in collection.py / sparse_update.py declare replicated
    out_specs whose replication holds "by construction" (the per-shard
    computation consumes only replicated operands) but is beyond the static
    checker, so they pass ``check_vma=False``.  Setting ``PEL_CHECK_VMA=1``
    turns the checker back on at trace time for those sites — run the parity
    suite under it after any refactor of the local bodies (pinned by
    tests/test_parallel.py::test_check_vma_debug_mode).
    """
    return os.environ.get("PEL_CHECK_VMA", "0") == "1"


def make_mesh(config: MeshConfig | None = None, *, data: int | None = None,
              model: int | None = None) -> Mesh:
    """Build a (data, model) mesh.  With no arguments, all local devices go on
    the model axis (lookup sharding), mirroring the reference's default of
    giving every DPU a table shard."""
    if config is not None:
        data, model = config.data, config.model
    n = jax.device_count()
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    devices = mesh_utils.create_device_mesh(
        (data, model), devices=jax.devices()[: data * model]
    )
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def col_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, MODEL_AXIS))


def shard_count(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]
