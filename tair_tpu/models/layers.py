"""Shared neural-net building blocks (Flax, NHWC, TPU-first).

Functional counterparts of /root/reference/terediff/model/util.py (timestep
embedding, zero-init modules, fp32 GroupNorm) re-designed for XLA: NHWC
layouts so convs tile onto the MXU, fp32 normalization islands inside a
bf16 compute stream, and `flax.linen.remat` instead of a custom autograd
checkpoint function.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import quant

Dtype = Any


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] ordering.

    Matches the SD/guided-diffusion convention
    (/root/reference/terediff/model/util.py:128-148).
    timesteps: [N] (possibly fractional) -> [N, dim] float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


import contextlib
import contextvars

# Trace-time switch: inside `gn_stats_over_batch()`, every GroupNorm32 pools
# its statistics over the BATCH axis as well as (H, W, group-channels). Used
# by the tiled VAE (utils/tilevae.py), where the batch axis holds the tiles
# of ONE image: pooled stats approximate full-image GroupNorm statistics —
# the TPU-shaped equivalent of the reference's cross-tile GroupNorm
# estimation (/root/reference/terediff/utils/tilevae/tilevae.py:307-579),
# whose absence is measurable as a per-tile brightness/contrast shift
# (tests/test_tilevae_seam.py).
_GN_STATS_OVER_BATCH: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "gn_stats_over_batch", default=False
)


@contextlib.contextmanager
def gn_stats_over_batch():
    """Within this context (at TRACE time), GroupNorm32 statistics pool over
    the batch axis. Only meaningful when the batch rows are tiles of one
    image; do not wrap ordinary batched calls."""
    token = _GN_STATS_OVER_BATCH.set(True)
    try:
        yield
    finally:
        _GN_STATS_OVER_BATCH.reset(token)


class GroupNorm32(nn.Module):
    """GroupNorm always computed in float32 (TPU VPU), cast back to input dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        # Production channel counts are all multiples of 32; tiny test configs
        # fall back to fewer groups rather than failing.
        groups = self.num_groups
        while x.shape[-1] % groups != 0:
            groups //= 2
        x32 = x.astype(jnp.float32)
        gn = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )
        if not _GN_STATS_OVER_BATCH.get():
            return gn(x32).astype(orig_dtype)
        # cross-tile path: create/read the SAME params as the standard path
        # (checkpoint-compatible), but normalize with stats pooled over
        # (batch, H, W, channels-within-group)
        if self.is_initializing():
            gn(x32)  # create params
        p = self.variables["params"][gn.name]
        b, h, w, c = x32.shape
        xg = x32.reshape(b, h, w, groups, c // groups)
        mu = xg.mean(axis=(0, 1, 2, 4), keepdims=True)
        var = xg.var(axis=(0, 1, 2, 4), keepdims=True)
        y = ((xg - mu) * jax.lax.rsqrt(var + self.epsilon)).reshape(b, h, w, c)
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(orig_dtype)


def _conv_impl(quantize: bool):
    """w8a8 serving path (ops/quant.py) when a quantized() scope is active."""
    if quantize and quant.active():
        return quant.w8a8_conv
    return None


def _dot_impl(quantize: bool):
    if quantize and quant.active():
        return quant.w8a8_dot_general
    return None


def conv3x3(features: int, dtype: Dtype = jnp.float32, zero_init: bool = False,
            name=None, quantize: bool = True):
    return nn.Conv(
        features,
        (3, 3),
        padding=1,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        conv_general_dilated=_conv_impl(quantize),
        name=name,
    )


def conv1x1(features: int, dtype: Dtype = jnp.float32, zero_init: bool = False,
            name=None, quantize: bool = True):
    return nn.Conv(
        features,
        (1, 1),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        conv_general_dilated=_conv_impl(quantize),
        name=name,
    )


def dense(features: int, dtype: Dtype = jnp.float32, use_bias: bool = True,
          zero_init: bool = False, name=None, quantize: bool = True):
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        dot_general=_dot_impl(quantize),
        name=name,
    )


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample for NHWC tensors.

    Implemented as reshape+broadcast (XLA lowers this to a cheap copy) instead
    of a gather-based resize.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class TimestepEmbedder(nn.Module):
    """Two-layer SiLU MLP over the sinusoidal embedding."""

    model_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = timestep_embedding(t, self.model_channels)
        # tiny and runs once per step: excluded from w8a8 serving quantization
        emb = dense(self.model_channels * 4, self.dtype, name="fc1", quantize=False)(emb)
        emb = nn.silu(emb)
        emb = dense(self.model_channels * 4, self.dtype, name="fc2", quantize=False)(emb)
        return emb
