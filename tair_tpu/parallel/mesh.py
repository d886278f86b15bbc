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
    """Multi-host init (no-op on a single process)."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
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
