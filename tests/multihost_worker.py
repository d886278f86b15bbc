"""Worker for tests/test_multihost.py: one of N processes in a real
multi-process SPMD job over CPU devices.

Each process owns 4 virtual CPU devices; the global dp-8 mesh spans both
processes, so the gradient psum of the jitted step crosses the process
boundary — the actual multi-host code path (init_distributed ->
jax.distributed.initialize -> global-view jit) that single-process tests
can only mock. Replaces the reference's NCCL DDP layer end to end
(/root/reference/train.py:28-29,66-67,181).

Usage: multihost_worker.py <process_id> <num_processes> <coordinator>
(env is prepared by the test)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tair_tpu.parallel.mesh import create_mesh, init_distributed


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    init_distributed()
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    n_dev = len(jax.devices())
    mesh = create_mesh(n_data=n_dev)

    # per-process shard of the global batch: distinct data per process
    local = np.arange(4 * 16, dtype=np.float32).reshape(4, 16) + 100.0 * pid
    sharding = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(sharding, local)
    w = jnp.ones((16, 4), jnp.float32) * 0.1

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    step = jax.jit(
        jax.value_and_grad(loss),
        in_shardings=(NamedSharding(mesh, P()), sharding),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
    with mesh:
        val, grad = step(w, x)
    # the grad psum crossed the process boundary; every process must agree
    print(f"GLOBAL loss={float(val):.6f} gradsum={float(jnp.sum(grad)):.6f}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
