"""SD KL-f8 autoencoder (Flax, NHWC).

Capability parity with /root/reference/terediff/model/vae.py:24-591 and
distributions.py:23-63 (AutoencoderKL: Encoder/Decoder resnet stacks, middle
attention block, DiagonalGaussianDistribution), re-designed NHWC for TPU.
Config used by TAIR: ch=128, ch_mult=(1,2,4,4), num_res_blocks=2, z=4,
double_z, no encoder/decoder attn except the middle block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import sdpa
from .layers import GroupNorm32, conv1x1, conv3x3, nearest_upsample_2x

Dtype = Any


@dataclass(frozen=True)
class VAEConfig:
    embed_dim: int = 4
    z_channels: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_channels: int = 3
    double_z: bool = True
    scale_factor: float = 0.18215


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm1")(x))
        h = conv3x3(self.out_channels, self.dtype, name="conv1")(h)
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm2")(h))
        h = conv3x3(self.out_channels, self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the spatial grid (VAE middle)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = conv1x1(c, self.dtype, name="q")(y).reshape(b, h * w, 1, c)
        k = conv1x1(c, self.dtype, name="k")(y).reshape(b, h * w, 1, c)
        v = conv1x1(c, self.dtype, name="v")(y).reshape(b, h * w, 1, c)
        o = sdpa(q, k, v).reshape(b, h, w, c)
        return x + conv1x1(c, self.dtype, name="proj_out")(o)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = conv3x3(cfg.ch, self.dtype, name="conv_in")(x.astype(self.dtype))
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, self.dtype, name=f"down_{level}_block_{i}")(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv, matching SD's
                # downsample so converted weights reproduce outputs exactly
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    cfg.ch * mult, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"down_{level}_downsample",
                )(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm_out")(h))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv3x3(out_ch, self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = conv3x3(block_in, self.dtype, name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = AttnBlock(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch, self.dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = nearest_upsample_2x(h)
                h = conv3x3(out_ch, self.dtype, name=f"up_{level}_upsample")(h)
        h = nn.swish(GroupNorm32(epsilon=1e-6, name="norm_out")(h))
        return conv3x3(cfg.out_channels, self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode(x) -> (mean, logvar); decode(z) -> image. NHWC, image in [-1,1]."""

    cfg: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = conv1x1(
            2 * self.cfg.embed_dim if self.cfg.double_z else self.cfg.embed_dim,
            self.dtype, name="quant_conv",
        )
        self.post_quant_conv = conv1x1(self.cfg.z_channels, self.dtype, name="post_quant_conv")

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode_moments(x)
        if sample:
            std = jnp.exp(0.5 * logvar)
            z = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar


def vae_encode(
    vae: AutoencoderKL,
    params,
    image: jnp.ndarray,
    rng=None,
    sample: bool = False,
    scale_factor: float = 0.18215,
) -> jnp.ndarray:
    """image [-1,1] NHWC -> scaled latent (mode or sample).

    Mirrors ControlLDM.vae_encode (/root/reference/terediff/model/cldm.py:92-119).
    """
    mean, logvar = vae.apply(params, image, method=AutoencoderKL.encode_moments)
    if sample:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    else:
        z = mean
    return z * scale_factor


def vae_decode(
    vae: AutoencoderKL, params, z: jnp.ndarray, scale_factor: float = 0.18215
) -> jnp.ndarray:
    return vae.apply(params, z / scale_factor, method=AutoencoderKL.decode)
