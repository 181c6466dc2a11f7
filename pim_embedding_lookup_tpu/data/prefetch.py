"""Async host->device input prefetch.

SURVEY.md §7 hard part (d): keep the input feed off the device's critical
path — the TPU analog of the reference overlapping its async result
callback with the next batch (emb_host.h:337 DPU_CALLBACK_ASYNC).  A
background thread stages upcoming batches onto the device (optionally
against explicit shardings) while the current step computes; the consumer
iterates already-device-resident pytrees.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax

_SENTINEL = object()


def device_prefetch(
    batches: Iterable[Any],
    *,
    buffer_size: int = 2,
    sharding: Any = None,
) -> Iterator[Any]:
    """Wrap a host batch iterator; yields device-resident pytrees.

    sharding: optional pytree (or single sharding broadcast to all leaves)
    passed to jax.device_put — e.g. batch-sharded NamedSharding for DP.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    err: list[BaseException] = []

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, sharding)

    def worker():
        try:
            for b in batches:
                q.put(put(b))
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
