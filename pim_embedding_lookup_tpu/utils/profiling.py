"""Profiling / tracing / observability.

Re-provides the reference's four instrumentation mechanisms (SURVEY.md §5):

1. Host phase timers inside lookup() gated by latency_print
   (emb_host.h:239-254,395-402, six named phases)  -> PhaseTimer.
2. Aggregate totals + per-unit busy intervals, mirrored to Python and dumped
   to CSV for the Gantt plotter (dputypes.py:87-98,
   graph/runtime_intervals/main.py)                -> IntervalRecorder +
   write_intervals_csv + plot_gantt.
3. On-DPU perfcounter cycles/instructions           -> XLA cost analysis via
   jitted-function cost stats (flops/bytes accessed).
4. SDK-level Chrome-trace JSON (upmem/test.json)    -> jax.profiler traces
   (trace() context manager below) viewable in Perfetto/TensorBoard —
   the same Chrome trace ecosystem the reference targets.
"""

from __future__ import annotations

import contextlib
import csv
import dataclasses
import time
from typing import Iterator

import jax


@dataclasses.dataclass
class Phase:
    name: str
    total_s: float = 0.0
    count: int = 0

    @property
    def mean_us(self) -> float:
        return 1e6 * self.total_s / max(self.count, 1)


class PhaseTimer:
    """Named-phase wall timer with device synchronization.

    The analog of the six phase latency prints in lookup()
    (emb_host.h:395-402: copy-in idx/offsets, query copy, launch, copy-out,
    callback prep, sync) — phases here are caller-defined since the TPU
    path has different (fewer) stages: host->device feed, compute+collective
    launch, device sync, host fetch.
    """

    def __init__(self):
        self.phases: dict[str, Phase] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *, sync: jax.Array | None = None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        p = self.phases.setdefault(name, Phase(name))
        p.total_s += dt
        p.count += 1

    def report(self) -> dict[str, float]:
        return {name: p.mean_us for name, p in self.phases.items()}

    def print_report(self) -> None:
        # same one-line-per-phase format family as emb_host.h:396-401
        for name, p in self.phases.items():
            print(f"{name}: {p.mean_us:.1f} us (n={p.count})")


@dataclasses.dataclass
class Interval:
    unit: int  # shard / device index (the per-DPU rank_id analog)
    label: str
    start_s: float
    end_s: float


class IntervalRecorder:
    """Collects per-unit busy intervals for the Gantt export
    (dpu_runtime_group/dpu_runtime_interval parity, emb_host.h:71-85)."""

    def __init__(self):
        self.intervals: list[Interval] = []
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def record(self, unit: int, label: str = "lookup") -> Iterator[None]:
        s = time.perf_counter() - self._t0
        yield
        e = time.perf_counter() - self._t0
        self.intervals.append(Interval(unit, label, s, e))


def write_intervals_csv(path: str, intervals: list[Interval]) -> None:
    """CSV schema matching dputypes.write_results (dputypes.py:87-98:
    rank_id, start, end rows consumed by graph/runtime_intervals/main.py)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["rank_id", "label", "start_ms", "end_ms"])
        for iv in intervals:
            w.writerow([iv.unit, iv.label, f"{iv.start_s*1e3:.3f}", f"{iv.end_s*1e3:.3f}"])


def plot_gantt(csv_path: str, out_png: str) -> None:
    """Per-unit interval Gantt (graph/runtime_intervals/main.py:8-28 parity).
    Imports matplotlib lazily; no-op gracefully if unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # plotting is optional in this image
        print("matplotlib unavailable; skipping gantt plot")
        return
    rows = []
    with open(csv_path) as f:
        for rec in csv.DictReader(f):
            rows.append(
                (int(rec["rank_id"]), float(rec["start_ms"]), float(rec["end_ms"]))
            )
    fig, ax = plt.subplots(figsize=(12, 6))
    for unit, s, e in rows:
        ax.barh(unit, e - s, left=s, height=0.8)
    ax.set_xlabel("time (ms)")
    ax.set_ylabel("shard")
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pel_trace") -> Iterator[None]:
    """jax.profiler trace -> Perfetto/TensorBoard (the Chrome-trace analog of
    upmem/test.json's SDK uprobe capture)."""
    with jax.profiler.trace(log_dir):
        yield


def cost_stats(jitted_fn, *args) -> dict[str, float]:
    """Compiled-program cost analysis: flops + bytes accessed — the
    perfcounter cycles/instructions analog (emb_dpu_lookup.c:38,136)."""
    lowered = jitted_fn.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns per-device list
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", -1.0)),
        "bytes_accessed": float(ca.get("bytes accessed", -1.0)),
    }
