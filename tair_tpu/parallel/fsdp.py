"""ZeRO-style fully-sharded data parallelism over the "data" mesh axis.

The reference replicates every parameter per rank (DDP via Accelerate,
/root/reference/train.py:28-29,66-67); on 16 GiB TPU chips the fp32 masters
(~10.3 GiB AOT at production widths, docs/PERFORMANCE.md) plus AdamW's two
moments leave no headroom for activations. FSDP shards every large
parameter/optimizer leaf across the data axis; XLA's SPMD partitioner then
all-gathers each weight just before use, reduce-scatters the gradients, and
runs the update on 1/n_data of the tree per chip — the ZeRO-3 schedule,
expressed purely as sharding annotations (no manual collectives, the
global-view program is unchanged).

The placement rule is SHAPE-based (largest mesh-divisible axis), so a
parameter and its Adam moments — same shape, different tree paths — always
land on the same shards. Path-based tensor-parallel specs (parallel/tp.py)
compose: the model axis claims its axis first and FSDP picks a different one.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from .tp import _spec_for

# Leaves smaller than this stay replicated: sharding a bias/norm vector saves
# nothing but costs an all-gather per use.
_MIN_ELEMS = 8192


def _leaf_spec(path: str, shape, n_data: int, n_model: int, min_elems: int) -> P:
    if shape is None or len(shape) == 0:
        return P()
    base = list(_spec_for(path, shape, n_model)) if n_model > 1 else []
    base += [None] * (len(shape) - len(base))
    size = 1
    for d in shape:
        size *= d
    if n_data > 1 and size >= min_elems:
        for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
            if base[ax] is None and shape[ax] % n_data == 0 and shape[ax] >= n_data:
                base[ax] = DATA_AXIS
                break
    if all(ax is None for ax in base):
        return P()
    return P(*base)


def fsdp_specs(
    tree: Any, n_data: int, n_model: int = 1, min_elems: int = _MIN_ELEMS
) -> Any:
    """PartitionSpec pytree for any state tree (params, moments, counts).

    Works on the full TrainState: optax moment leaves mirror their parameter's
    shape and trailing tree path, so they receive identical specs; scalars and
    small leaves replicate.
    """

    def leaf(kp, v):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        return _leaf_spec(path, getattr(v, "shape", None), n_data, n_model, min_elems)

    return jax.tree_util.tree_map_with_path(leaf, tree)


def state_shardings(
    mesh: Mesh, tree: Any, min_elems: int = _MIN_ELEMS
) -> Any:
    """NamedSharding pytree for `tree` under FSDP(+TP) on `mesh` — pass as
    make_train_step(state_sharding=...) so the updated state STAYS sharded."""
    n_data = mesh.shape[DATA_AXIS]
    n_model = dict(mesh.shape).get(MODEL_AXIS, 1)
    specs = fsdp_specs(tree, n_data, n_model, min_elems)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_tree_fsdp(mesh: Mesh, tree: Any, min_elems: int = _MIN_ELEMS) -> Any:
    """device_put `tree` with FSDP(+TP) shardings on `mesh`."""
    shardings = state_shardings(mesh, tree, min_elems)
    return jax.tree.map(jax.device_put, tree, shardings)


def sharded_fraction(mesh: Mesh, tree: Any, min_elems: int = _MIN_ELEMS):
    """(sharded_bytes, total_bytes, per_device_bytes) under the rules —
    the memory story to log at startup."""
    n_data = mesh.shape[DATA_AXIS]
    n_model = dict(mesh.shape).get(MODEL_AXIS, 1)
    return fraction_for(tree, n_data, n_model, min_elems)


def fraction_for(
    tree: Any, n_data: int, n_model: int = 1, min_elems: int = _MIN_ELEMS
):
    """Mesh-free variant of sharded_fraction: works on concrete arrays or
    jax.eval_shape ShapeDtypeStructs (analytic capacity planning)."""
    specs = fsdp_specs(tree, n_data, n_model, min_elems)
    sharded = total = per_dev = 0
    for v, s in zip(
        jax.tree.leaves(tree),
        jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)),
    ):
        if not hasattr(v, "dtype"):
            continue
        b = v.size * v.dtype.itemsize
        total += b
        denom = 1
        for name in s:
            if name == DATA_AXIS:
                denom *= n_data
            elif name == MODEL_AXIS:
                denom *= n_model
        if denom > 1:
            sharded += b
        per_dev += b // denom
    return sharded, total, per_dev
