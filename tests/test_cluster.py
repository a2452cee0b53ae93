"""Two-process jax.distributed smoke test (VERDICT r4 item 6).

Spawns 2 CPU processes against a local coordination service
(parallel/cluster.py initialize — the one code path single-process
virtual-device meshes cannot reach), runs the SPMD distributed aggregate
over the 2-process global mesh, and asserts parity with a directly
computed oracle. The reference's analogous machinery only performs
registration bookkeeping and never executes
(/root/reference/crates/query-distributed/src/coordinator.rs:45-107);
this test moves real rows across a process boundary.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "cluster_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_aggregate(tmp_path):
    port = _free_port()
    out_path = tmp_path / "result.json"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # one local device per process -> the 2-device global mesh spans
        # the process boundary
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, str(port), str(pid), str(out_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=300)
            outs.append((p.returncode, stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, stdout, stderr in outs:
        assert rc == 0, f"child failed rc={rc}\n{stderr[-3000:]}"
    got = json.loads(out_path.read_text())

    # oracle: same data generation as the child
    rng = np.random.default_rng(11)
    n = 4096
    k = rng.integers(0, 16, n)
    v = rng.integers(0, 1000, n)
    expected = {}
    for key in np.unique(k):
        mask = k == key
        expected[str(int(key))] = [int(mask.sum()), int(v[mask].sum())]
    assert got == expected
