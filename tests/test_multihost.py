"""Opt-in multi-PROCESS test (SURVEY.md §4: "multi-host tests on CPU
`jax.distributed`").  Spawns two local worker processes that form one
8-device global mesh; asserts cross-process sharded-PGO equivalence and a
sequence shard spanning the process boundary.

Slow (~2-4 min; spawns JAX processes) and needs free localhost ports, so
it only runs when explicitly requested:

    MULLS_MULTIHOST=1 python -m pytest tests/test_multihost.py -q

The committed evidence artifact of the same run is docs/MULTIHOST_r04.json
(written by tools/multihost_smoke.py).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("MULLS_MULTIHOST"),
                    reason="opt-in: set MULLS_MULTIHOST=1")
def test_two_process_distributed_smoke():
    p = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "multihost_smoke.py")],
        cwd=_REPO, capture_output=True, text=True, timeout=1700)
    assert p.returncode == 0, p.stdout[-3000:] + p.stderr[-2000:]
    with open(os.path.join(_REPO, "docs", "MULTIHOST_r04.json")) as f:
        res = json.load(f)
    assert res["ok"] and res["processes"] == 2
    assert res["global_devices"] == 8
    assert res["pgo_node_delta_m"] < 5e-2
    assert max(res["multiseq_max_drift_m"]) < 0.5
