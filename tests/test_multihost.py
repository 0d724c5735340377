"""Real multi-process jax.distributed execution (2 processes x 4
virtual CPU devices, coordinator on localhost) — the distributed
backend SURVEY §2.3 names as a first-class to-be-created layer.

The worker (scripts/multihost_worker.py) drives the full distributed
query path over the global 8-device mesh — component-sharded counting
with DCN-psum'd gocc and data-parallel trie search — and verifies both
against a host-side global FM oracle inside each process.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "multihost_worker.py",
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    out = str(tmp_path / "mh2.json")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2", out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for i in range(2)
    ]
    errs = []
    for i, p in enumerate(procs):
        _, se = p.communicate(timeout=550)
        if p.returncode != 0:
            errs.append(f"proc {i} rc={p.returncode}:\n{se.decode()[-2000:]}")
    assert not errs, "\n".join(errs)
    res = json.load(open(out))
    assert res["nproc"] == 2 and res["devices"] == 8
    assert res["count_ok"], "sharded count diverged from the global oracle"
    assert res["trie_ok"], "sharded trie search diverged from the oracle"
    assert res["pipeline_ok"], (
        "multi-process SeedFinder pipeline diverged from single-device"
    )
    assert res["pipeline_hits"] > 0
