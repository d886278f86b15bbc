"""Device mesh + sharding helpers (the framework's distributed substrate).

Replaces the reference's HF-Accelerate/NCCL DDP layer
(/root/reference/train.py:28-29,66-67,181) with JAX SPMD: a named
`jax.sharding.Mesh`, `NamedSharding` annotations, and XLA collectives over
ICI. Data parallelism shards the batch on the "data" axis; parameters are
replicated (the reference's only parallelism is DP). A "model" axis is
reserved for tensor-parallel sharding of the UNet/VAE convs if ever needed.
Multi-host: call `init_distributed()` before mesh creation; collectives then
ride ICI intra-pod and DCN across hosts automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed() -> None:
    """Multi-host init. Must run before any other jax call in a multi-host
    job (replaces accelerate's implicit NCCL init, reference train.py:66-67).

    `jax.process_count()` is NOT a valid probe before `initialize()` (it
    reports 1 until the coordinator handshake happens), so we gate on the
    cluster environment instead: call `jax.distributed.initialize()` when a
    coordinator address, a multi-worker TPU pod env (>1 hostname in
    TPU_WORKER_HOSTNAMES), or a multi-node SLURM allocation is present.
    A RuntimeError from double-initialization is the only error swallowed;
    real init failures propagate so multi-host misconfiguration fails
    loudly instead of deadlocking in the first collective.

    Caveat: plain GCE TPU pod slices advertise their topology via the
    metadata SERVER (jax's GceTpuCluster queries it inside initialize()),
    not via env vars, so env probing cannot see them. For those, set
    TAIR_MULTIHOST=1 (or JAX_COORDINATOR_ADDRESS) to force the call —
    unconditional initialize() is not an option because single-chip PJRT
    relays would then crash at startup (see the worker gate below).
    """
    import os

    # Manual topology override (also how the 2-process integration test
    # drives this path, tests/test_multihost.py): the no-arg initialize()
    # only auto-detects SLURM/TPU/GKE clusters, so ad-hoc multi-process
    # launches pass the coordinator + rank explicitly.
    kwargs = {}
    if "TAIR_NUM_PROCESSES" in os.environ:
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["TAIR_NUM_PROCESSES"]),
            process_id=int(os.environ["TAIR_PROCESS_ID"]),
        )

    if os.environ.get("TAIR_MULTIHOST", "0") == "1" or kwargs:
        jax.distributed.initialize(**kwargs)
        return

    coordinator = any(
        k in os.environ
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    # cloud TPU pod: multi-host only when there is MORE THAN ONE worker —
    # single-chip PJRT plugins (e.g. the axon relay) set
    # TPU_WORKER_HOSTNAMES=localhost in every process, and calling
    # initialize() there fails hard once the backend is up
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = "," in workers
    slurm_nodes = os.environ.get("SLURM_JOB_NUM_NODES", "1")
    multi_node = slurm_nodes.isdigit() and int(slurm_nodes) > 1
    if not (coordinator or multi_worker or multi_node):
        return  # single-process: nothing to initialize
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} impossible with {len(devices)} devices"
        )
    # an explicit smaller mesh uses the first n_data*n_model devices (e.g.
    # a 1x1 smoke config on a host that exposes 8 virtual devices)
    if n_data * n_model < len(devices):
        devices = devices[: n_data * n_model]
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch pytree with batch-dim sharding."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
