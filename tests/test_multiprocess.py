"""True multi-process tests: 2 OS processes x 4 virtual CPU devices each,
joined with jax.distributed over a localhost coordinator.

This exercises the N-host path for real — non-addressable global arrays,
make_array_from_callback table placement, cross-process gloo collectives —
which the in-process 8-device mesh tests cannot (SURVEY.md §2c: the
reference has no inter-node story at all; BASELINE.md north star demands
1 -> N host scaling).  Each worker checks lookup + sparse-update parity
against a numpy oracle on its addressable shards (tests/_mp_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(policy: str, nproc: int = 2, timeout: int = 240):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), policy],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\nstdout:\n{out[-2000:]}\n"
            f"stderr:\n{err[-4000:]}"
        )
        assert "OK" in out


@pytest.mark.parametrize("policy", ["row_hash", "row", "column", "replicate"])
def test_two_process_lookup_and_update(policy):
    _run_cluster(policy)
