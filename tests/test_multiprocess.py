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
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(policy: str, nproc: int = 2, timeout: int = 240,
                 local_devices: int = 4):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), policy,
             str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(nproc)
    ]
    # Liveness guard: if one worker dies (e.g. an assert), its peers block
    # forever in the next gloo collective — kill them so the failure
    # surfaces as the dead worker's traceback, not a 240s timeout.
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        codes = [p.poll() for p in procs]
        if all(c is not None for c in codes):
            break
        if any(c not in (None, 0) for c in codes):
            time.sleep(2)  # grace: let same-fate peers exit on their own
            for p in procs:
                if p.poll() is None:
                    p.kill()
            break
        time.sleep(0.2)
    else:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = [p.communicate(timeout=30) for p in procs]
    failed = [
        (pid, p.returncode, out, err)
        for pid, (p, (out, err)) in enumerate(zip(procs, outs))
        if p.returncode != 0
    ]
    # report a worker that FAILED (nonzero, not our -9 peer-kill) first
    failed.sort(key=lambda f: (f[1] == -9, f[0]))
    assert not failed, "\n\n".join(
        f"worker {pid} rc={rc}\nstdout:\n{out[-2000:]}\nstderr:\n{err[-4000:]}"
        for pid, rc, out, err in failed
    )
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert "OK" in out, f"worker {pid} produced no OK\n{out}\n{err}"


@pytest.mark.parametrize("policy", ["row_hash", "row", "column", "replicate"])
def test_two_process_lookup_and_update(policy):
    _run_cluster(policy)


def test_four_process_pod_mesh():
    """4 OS processes x 2 virtual devices: a (data=4, model=2) pod mesh
    where the DATA axis spans process pairs and the MODEL axis stays
    process-local — pins make_pod_mesh's ICI-inside/DCN-across placement
    rule (the reference's within-rank analog, emb_types.h:6-7) and
    make_global_queries at nproc=4 under ROW_HASH (VERDICT r4 item 7).
    The worker asserts every model-axis row is single-process, then runs
    the full lookup/update/routed/CSR/hybrid-train parity battery."""
    _run_cluster("row_hash", nproc=4, local_devices=2, timeout=360)
