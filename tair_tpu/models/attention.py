"""Spatial transformer blocks for the SD UNet (Flax, NHWC).

Capability parity with /root/reference/terediff/model/attention.py
(CrossAttention / BasicTransformerBlock / SpatialTransformer, the
use_linear=True variant used by the TAIR configs), designed around a single
SDPA dispatch point (tair_tpu.ops.attention) instead of three module classes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import sdpa
from .layers import GroupNorm32, dense

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    heads: int
    dim_head: int
    query_dim: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = dense(inner, self.dtype, use_bias=False, name="to_q")(x)
        k = dense(inner, self.dtype, use_bias=False, name="to_k")(ctx)
        v = dense(inner, self.dtype, use_bias=False, name="to_v")(ctx)

        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, self.heads, self.dim_head)
        k = k.reshape(b, tk, self.heads, self.dim_head)
        v = v.reshape(b, tk, self.heads, self.dim_head)
        out = sdpa(q, k, v).reshape(b, tq, inner)
        return dense(self.query_dim, self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = dense(self.dim_out * 2, self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, self.dtype, name="geglu")(x)
        return dense(self.dim, self.dtype, name="out")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm1")(x)
        x = x + CrossAttention(
            heads=self.heads,
            dim_head=self.dim_head,
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            dtype=self.dtype,
            name="attn1",
        )(h.astype(self.dtype), context if self.disable_self_attn else None)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(
            heads=self.heads,
            dim_head=self.dim_head,
            query_dim=self.dim,
            context_dim=self.context_dim,
            dtype=self.dtype,
            name="attn2",
        )(h.astype(self.dtype), context)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h.astype(self.dtype))
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> linear proj -> transformer blocks -> zero-init linear out.

    NHWC in/out; tokens are the flattened spatial grid. The linear-projection
    variant (use_linear_in_transformer=True) is the one every TAIR config
    uses, so it is the only one implemented.
    """

    channels: int
    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = dense(inner, self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=self.context_dim,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, context)
        x = dense(self.channels, self.dtype, zero_init=True, name="proj_out")(x)
        return x.reshape(b, h, w, self.channels) + x_in
