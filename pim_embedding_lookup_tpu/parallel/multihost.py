"""Multi-host (multi-process) bootstrap and DCN-aware mesh construction.

The reference is strictly single-host: its "distributed backend" is the
UPMEM host<->DPU transfer layer (SURVEY.md §2c; no NCCL/MPI/Gloo anywhere).
The TPU build scales across hosts with jax.distributed over DCN + XLA
collectives over ICI.  BASELINE.json's north star measures 1 chip -> 1 host
-> N>=2 hosts scaling efficiency; this module is the N-host entry.

Usage (one process per host):
    from pim_embedding_lookup_tpu.parallel import multihost
    multihost.initialize()          # env-driven (TPU pods auto-discover)
    mesh = multihost.make_pod_mesh(data=jax.process_count(), model=...)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with TPU-pod auto-discovery when args are
    None.  Idempotent: safe to call when already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_pod_mesh(data: int | None = None, model: int | None = None) -> Mesh:
    """Global (data, model) mesh over all processes' devices.

    Layout rule: the model axis (table shards, psum-heavy) stays
    *within* hosts so its collectives ride ICI; the data axis (batch,
    gradient all-reduce once per step) spans hosts over DCN.  This is the
    TPU analog of the reference keeping a table's columns within one DPU
    rank (64 DPUs/rank, emb_types.h:6).
    """
    n = jax.device_count()  # global
    local = jax.local_device_count()
    if model is None:
        model = min(local, n)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    devices = mesh_utils.create_device_mesh(
        (data, model), allow_split_physical_axes=True
    )
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def is_primary() -> bool:
    return jax.process_index() == 0


def device_put_tables(coll, host_tables) -> jax.Array:
    """Multi-process populate_mram (emb_host.h:136): every process holds the
    full per-table host weights; each device materializes only its own shard
    via make_array_from_callback (plain jax.device_put cannot target
    non-addressable devices on a pod)."""
    fused = coll.fused_host_array(host_tables)
    return jax.make_array_from_callback(
        fused.shape, coll.table_sharding, lambda idx: fused[idx]
    )


def make_global_queries(
    mesh: Mesh, indices: np.ndarray, mask: np.ndarray
) -> tuple[jax.Array, jax.Array]:
    """Assemble the global [T, B*L] query arrays from per-process batch
    chunks (batch sharded over the data axis, replicated over model).

    Each process passes ITS OWN slice of the batch — the N-host analog of
    the reference pushing each table's indices to that table's DPUs
    (emb_host.h:258-263); here the partitioning is by batch, and XLA moves
    ids/rows over ICI/DCN as the lookup's collectives require.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    idx = jax.make_array_from_process_local_data(sh, indices)
    msk = jax.make_array_from_process_local_data(sh, mask)
    return idx, msk
