"""Attention primitives.

One dispatch point for all scaled-dot-product attention in the framework,
replacing the reference's three interchangeable torch implementations
(/root/reference/terediff/model/attention.py:54-260, selected globally by
Config.attn_mode). On TPU the default is `jax.nn.dot_product_attention`,
which XLA fuses into a flash-style kernel; a Pallas flash kernel can be
swapped in via `set_attn_impl` for the hot 4096-token self-attention.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

# Registry so a Pallas kernel can be installed without touching model code.
_ATTN_IMPL: dict[str, Callable] = {}


def xla_sdpa(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,  # [B, Tk, H, D]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    return jax.nn.dot_product_attention(q, k, v, scale=scale)


def einsum_sdpa(q, k, v, scale: Optional[float] = None):
    """Reference oracle: explicit einsum attention with fp32 softmax."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


_ATTN_IMPL["xla"] = xla_sdpa
_ATTN_IMPL["einsum"] = einsum_sdpa
_DEFAULT = "xla"


def set_attn_impl(name: str) -> None:
    global _DEFAULT
    if name not in _ATTN_IMPL:
        raise ValueError(f"unknown attention impl {name!r}; have {list(_ATTN_IMPL)}")
    _DEFAULT = name


def register_attn_impl(name: str, fn: Callable) -> None:
    _ATTN_IMPL[name] = fn


def sdpa(q, k, v, scale: Optional[float] = None) -> jnp.ndarray:
    """Scaled dot-product attention over [B, T, H, D] tensors."""
    return _ATTN_IMPL[_DEFAULT](q, k, v, scale=scale)


def enable_inference_kernels() -> str:
    """Select the attention impl for inference on the current backend.

    Measured on v5e (full 50-step restore): XLA's fused SDPA edges out the
    Pallas flash kernel at inference batch sizes, so XLA stays the default;
    set TAIR_ATTN=pallas to opt in (the kernel wins on isolated large-batch
    attention microbenchmarks). The Pallas kernel has a custom VJP (two-pass
    flash backward), so it is safe for training as well.
    """
    import os

    choice = os.environ.get("TAIR_ATTN", "xla")
    if choice == "pallas" and jax.default_backend() in ("tpu", "axon"):
        from . import flash_attention  # noqa: F401  (registers "pallas")

        set_attn_impl("pallas")
    else:
        set_attn_impl("xla")
    return _DEFAULT
