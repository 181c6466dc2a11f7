"""Test configuration: run everything on the CPU backend with 8 virtual
devices so mesh/sharding tests exercise real multi-device code paths
(SURVEY.md §4: the reference is hardware-in-the-loop only — we add the
simulator story it lacks)."""

import os

# NOTE: this environment pre-registers a TPU ("axon") backend via
# sitecustomize and pins JAX_PLATFORMS=axon, so plain env vars are not
# enough — force the CPU platform through jax.config before first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def numpy_embedding_bag(table, indices, offsets, combiner="sum"):
    """CPU oracle — the analog of validate_result (load_generator.c:40-65),
    which recomputes every pooled sum from the original float tables."""
    table = np.asarray(table)
    indices = np.asarray(indices)
    offsets = np.asarray(offsets)
    b = len(offsets) - 1
    out = np.zeros((b, table.shape[1]), dtype=np.float64)
    for i in range(b):
        bag = indices[offsets[i] : offsets[i + 1]]
        if len(bag) == 0:
            continue
        rows = table[bag].astype(np.float64)
        if combiner == "sum":
            out[i] = rows.sum(0)
        elif combiner == "mean":
            out[i] = rows.mean(0)
        elif combiner == "max":
            out[i] = rows.max(0)
    return out.astype(np.float32)


@pytest.fixture
def oracle():
    return numpy_embedding_bag
