"""Smoke tests for the tools/ harnesses (CPU backend, tiny configs)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(script, *args, timeout=300):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv=['{script}']+{list(args)!r};"
        f"exec(open('{script}').read())"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


def test_serving_bench_smoke():
    r = run_tool(
        "tools/serving_bench.py",
        "--config", "toy", "--batch", "16", "--qps", "50", "--duration", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["requests"] > 0
    assert rep["p99_ms"] >= rep["p50_ms"] > 0


def test_serving_bench_pipelined_smoke():
    r = run_tool(
        "tools/serving_bench.py",
        "--config", "toy", "--batch", "16", "--qps", "200", "--duration", "2",
        "--inflight", "8",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["inflight"] == 8
    assert rep["requests"] > 0
    assert rep["p99_ms"] >= rep["p50_ms"] > 0


def test_trace_capture_smoke(tmp_path):
    r = run_tool(
        "tools/trace_capture.py",
        "--config", "toy", "--batch", "16", "--iters", "2",
        "--out", str(tmp_path / "trace"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import os
    assert os.path.exists(tmp_path / "trace" / "intervals.csv")


def test_serving_bench_microbatch_smoke():
    r = run_tool(
        "tools/serving_bench.py",
        "--config", "toy", "--batch", "8", "--qps", "500", "--duration", "2",
        "--microbatch", "4", "--inflight", "2", "--max-wait-ms", "5",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["microbatch"] == 4
    assert rep["requests"] > 0
    # aggregation must actually aggregate: fewer dispatches than requests
    assert rep["dispatches"] < rep["requests"]
    assert rep["p99_ms"] >= rep["p50_ms"] > 0


def test_scaling_bench_smoke():
    r = run_tool(
        "tools/scaling_bench.py",
        "--force-cpu", "4", "--rows", "5000", "--tables", "2",
        "--batch", "64", "--pooling", "4", "--iters", "3",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert "1" in rep["lookups_per_s"] and "4" in rep["lookups_per_s"]
    assert rep["scaling_efficiency"]["1"] == 1.0


def test_phase_bench_smoke(capfd):
    import sys as _sys

    import tools.phase_bench as pb

    argv = _sys.argv
    _sys.argv = ["phase_bench", "--config", "toy", "--batch", "32",
                 "--iters", "2"]
    try:
        pb.main()
    finally:
        _sys.argv = argv
    out = capfd.readouterr().out
    assert '"lookup_phase_latency_us"' in out
    assert '"feed"' in out and '"compute"' in out


def test_capacity_bench_smoke(capfd):
    import sys as _sys

    import tools.capacity_bench as cb

    argv = _sys.argv
    _sys.argv = ["capacity_bench", "--tables", "2", "--rows", "5000",
                 "--dim", "16", "--batch", "64", "--iters", "2"]
    try:
        cb.main()
    finally:
        _sys.argv = argv
    out = capfd.readouterr().out
    assert '"int8_capacity_pooled_lookups_per_s"' in out


def test_kernel_lab_drophot_smoke():
    """The drop/zipf/hot probes behind the scatter-wall findings in
    docs/PERF.md stay runnable."""
    r = run_tool(
        "tools/kernel_lab.py",
        "--rows", "4096", "--dim", "16", "--batch", "32", "--tables", "2",
        "--iters", "2", "--only", "drophot",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "scatter dropfrac=0.9" in r.stderr
    assert "scatter zipf-ids" in r.stderr
    assert "gather hotfrac=0.5" in r.stderr
