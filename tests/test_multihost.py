"""Real 2-process multi-host SPMD integration test (CPU backend).

Launches two worker processes that each own 4 virtual CPU devices, run
init_distributed() against a local coordinator, build the global dp-8 mesh,
and execute a jitted grad step whose psum crosses the process boundary.
Asserts both ranks compute identical global values — the property the
reference gets from NCCL DDP (/root/reference/train.py:181) and that
single-process unit tests (test_init_distributed.py) cannot cover.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(pid, nproc, coord):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COORDINATOR_ADDRESS"] = coord
    env["TAIR_NUM_PROCESSES"] = str(nproc)
    env["TAIR_PROCESS_ID"] = str(pid)
    return env


def test_two_process_grad_psum():
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", coord],
            env=_worker_env(i, 2, coord),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)

    globals_ = [
        [ln for ln in o.splitlines() if ln.startswith("GLOBAL")] for o in outs
    ]
    assert globals_[0] and globals_[1], "\n---\n".join(outs)
    # ranks saw DIFFERENT local data but must agree on the global result
    assert globals_[0][-1] == globals_[1][-1], "\n---\n".join(outs)
