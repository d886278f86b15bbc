"""Tensor-parallel parameter sharding (Megatron pairing under GSPMD).

The reference's only parallelism is data-parallel DDP (SURVEY §2.8); this
module is the TPU-native extension that the "model" mesh axis exists for:
serving a batch-1 restoration loop cannot scale by DP, so the transformer
weights are sharded column/row-parallel over ICI and XLA's SPMD partitioner
inserts the all-gathers/reduce-scatters (no manual collectives — the GSPMD
global-view program stays identical to the single-chip one).

Pairing rules (classic Megatron):
  column-parallel (shard the OUTPUT features):  qkv projections, the first
    FFN matmul (incl. GEGLU's fused proj), patch/`proj_in` projections,
    msda `value_proj`
  row-parallel (shard the INPUT features):      attention output
    projections, the second FFN matmul, `proj_out`, msda `output_proj`
Everything else (convs, norms, embeddings, heads) stays replicated — the
conv trunk is memory-light relative to activations and GSPMD would insert
per-conv collectives that don't pay at these widths.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# path substrings -> which kernel axis carries the sharded feature dim.
# nn.Dense kernels are [in, out]; nn.MultiHeadDotProductAttention packs
# [emb, heads, head_dim] (q/k/v) and [heads, head_dim, emb] (out); CLIP's
# tower uses the same MHA layout.
_COLUMN = (  # shard last axis (output features / head_dim)
    "to_q/kernel", "to_k/kernel", "to_v/kernel",
    "ff/geglu/proj/kernel", "mlp_fc/kernel", "linear1/kernel",
    "linear1_text/kernel", "value_proj/kernel", "proj_in/kernel",
)
_COLUMN_HEADS = (  # MHA qkv: shard the heads axis (axis 1 of 3)
    "attn/query/kernel", "attn/key/kernel", "attn/value/kernel",
    "attn_intra/query/kernel", "attn_intra/key/kernel", "attn_intra/value/kernel",
    "attn_inter/query/kernel", "attn_inter/key/kernel", "attn_inter/value/kernel",
    "attn_intra_text/query/kernel", "attn_inter_text/query/kernel",
    "attn_intra_text/key/kernel", "attn_inter_text/key/kernel",
    "attn_intra_text/value/kernel", "attn_inter_text/value/kernel",
)
_ROW = (  # shard first axis (input features)
    "to_out/kernel", "ff/out/kernel", "mlp_proj/kernel", "linear2/kernel",
    "linear2_text/kernel", "output_proj/kernel", "proj_out/kernel",
)
_ROW_HEADS = (  # MHA out: [heads, head_dim, emb] -> shard heads (axis 0)
    "attn/out/kernel", "attn_intra/out/kernel", "attn_inter/out/kernel",
    "attn_intra_text/out/kernel", "attn_inter_text/out/kernel",
)


def _spec_for(path: str, shape, n_model: int):
    def fits(axis):
        return shape[axis] % n_model == 0 and shape[axis] >= 2 * n_model

    if any(path.endswith(s) for s in _COLUMN) and len(shape) >= 2 and fits(-1):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    if any(path.endswith(s) for s in _COLUMN_HEADS) and len(shape) == 3 and fits(1):
        return P(None, MODEL_AXIS, None)
    if any(path.endswith(s) for s in _ROW) and len(shape) >= 2 and fits(0):
        return P(*([MODEL_AXIS] + [None] * (len(shape) - 1)))
    if any(path.endswith(s) for s in _ROW_HEADS) and len(shape) == 3 and fits(0):
        return P(MODEL_AXIS, None, None)
    return P()


def tensor_parallel_specs(params: Any, n_model: int) -> Any:
    """PartitionSpec pytree for a param tree (replicated where no rule hits)."""

    def leaf(kp, v):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        return _spec_for(path, v.shape, n_model)

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """device_put the param tree with TP shardings on `mesh`'s model axis.

    With n_model == 1 every spec degenerates to replication, so this is
    safe to call unconditionally.
    """
    n_model = mesh.shape[MODEL_AXIS]
    specs = tensor_parallel_specs(params, n_model)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs
    )


def count_sharded(params: Any, n_model: int):
    """(n_sharded_leaves, sharded_bytes, total_bytes) under the rules."""
    specs = tensor_parallel_specs(params, n_model)
    n = sz = tot = 0
    for v, s in zip(jax.tree.leaves(params), jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))):
        b = v.size * v.dtype.itemsize
        tot += b
        if any(ax is not None for ax in s):
            n += 1
            sz += b
    return n, sz, tot
