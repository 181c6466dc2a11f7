"""Compiled-HLO assertion for the routed ~E/M issue-count claim (VERDICT r3
next-round item 3): the one multi-chip property this single-host environment
CAN verify mechanically.

Reference seam: the host broadcasts ALL E indices to every DPU of a table
(emb_host.h:258-263).  The broadcast shard_map lookup keeps that shape
(every model shard gathers E entries and masks by ownership); the routed
all-to-all path exists precisely to beat it.  Here we lower both at
M in {2, 4, 8}, walk the optimized per-shard HLO, and assert the gather
row counts — so the multi-chip scaling story rests on the compiler's
output, not prose.  The committed counts live in
benchmarks/scaling_routed_cpu8.json (regenerate: python
tools/routed_hlo_audit.py).
"""

import json
import os

import pytest

from tools.routed_hlo_audit import audit

E_TOTAL = 1024


@pytest.mark.parametrize("m", [2, 4, 8])
def test_routed_gathers_scale_inverse_m(m):
    rec = audit(m, e_total=E_TOTAL)
    # broadcast: every shard still walks all E entries (emb_host.h:258-263)
    assert max(rec["broadcast_gather_rows"]) == E_TOTAL
    # routed: the largest per-shard gather is the capacity-bucketed
    # M*K = ~cf*E/M table gather — and NOTHING touches E rows
    assert max(rec["routed_gather_rows"]) == rec["expected_routed_rows"]
    assert rec["expected_routed_rows"] == E_TOTAL // m  # cf=1.0, exact here
    assert E_TOTAL not in rec["routed_gather_rows"]


def test_committed_artifact_matches_audit():
    """The benchmarks/ artifact carries the same counts the compiler
    produces today (drift = stale evidence)."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "benchmarks",
        "scaling_routed_cpu8.json",
    )
    with open(path) as f:
        doc = json.load(f)
    rows = doc.get("per_shard_gather_rows")
    assert rows, "run tools/routed_hlo_audit.py to generate the audit section"
    rec = audit(4, e_total=E_TOTAL)
    assert rows["4"]["routed_max_gather"] == max(rec["routed_gather_rows"])
    assert rows["4"]["broadcast_max_gather"] == max(rec["broadcast_gather_rows"])


@pytest.mark.parametrize("m", [2, 8])
def test_routed_csr_gathers_scale_inverse_m(m):
    """The ragged wire shape (lookup_csr routed=True) shows the same
    per-shard HLO signature: table gathers at ~cf*E/M, nothing at E."""
    rec = audit(m, e_total=E_TOTAL)
    assert max(rec["routed_csr_gather_rows"]) == rec["expected_routed_rows"]
    assert E_TOTAL not in rec["routed_csr_gather_rows"]
