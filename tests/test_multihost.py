"""Multi-host (pod) path validation on a REAL 2-process jax CPU cluster.

The production wiring under test is `parallel/distributed.py`: launcher-env
parsing -> jax.distributed.initialize (reference distributed_utils.py:16-77),
allreduce_stats (reference GDict.allreduce, array_ops.py:745), the DistVar
coordination-service counter (reference TCPStore DistVar,
distributed_utils.py:157-215), and a psum over a global mesh spanning both
processes — the DCN-analogue gradient plane. Everything runs in spawned
subprocesses so this suite's own single-process jax is untouched.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(240)
def test_two_process_cpu_pod(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for rank in range(2):
        out = tmp_path / f"rank{rank}.json"
        outs.append(out)
        env = dict(
            os.environ,
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            WORLD_SIZE="2",
            RANK=str(rank),
            PCRL_MULTIHOST_OUT=str(out),
        )
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=220)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (coordination hang)")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"rank failed:\n{log[-3000:]}"
    for out in outs:
        res = json.loads(out.read_text())
        assert res["ok"] and res["psum"] == 26.0, res
