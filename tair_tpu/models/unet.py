"""SD-2.1 UNet + ControlNet (Flax, NHWC, TPU-first).

Capability parity with:
  - UNetModel / ControlledUnetModel: /root/reference/terediff/model/unet.py:352-719,
    /root/reference/terediff/model/controlnet.py:16-56
  - ControlNet: /root/reference/terediff/model/controlnet.py:59-337

Design departures from the torch reference (deliberate, TPU-first):
  - NHWC layout end to end (XLA tiles NHWC convs onto the MXU directly).
  - The "controlled" forward and the decoder feature taps are flags on one
    UNet module rather than a subclass mutating a list; outputs are a pytree
    `(eps, feats)` with feats a tuple of 4 NHWC tensors taken after output
    blocks (2, 5, 8, 11) - i.e. after each tagged block's trailing upsample,
    giving channels (1280, 1280, 640, 320) at 1/4,1/2,1,1 of latent res.
  - Gradient checkpointing via `flax.linen.remat` per block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import SpatialTransformer
from .layers import (
    GroupNorm32,
    TimestepEmbedder,
    conv1x1,
    conv3x3,
    dense,
    nearest_upsample_2x,
)

Dtype = Any


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    use_checkpoint: bool = False
    # ControlNet only:
    hint_channels: int = 4

    @property
    def extract_idx(self) -> Tuple[int, ...]:
        """Decoder output-block indices whose hidden states feed the spotter."""
        n = self.num_res_blocks + 1
        return tuple(n * (i + 1) - 1 for i in range(len(self.channel_mult)))


class ResBlock(nn.Module):
    out_channels: int
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.silu(GroupNorm32(name="in_norm")(x))
        h = conv3x3(self.out_channels, self.dtype, name="in_conv")(h)
        # emb_proj is tiny (per-step cost ~0) and numerically load-bearing
        # (scale/shift of the norm): excluded from w8a8 serving quantization
        emb_out = dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            self.dtype,
            name="emb_proj",
            quantize=False,
        )(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
        else:
            h = h + emb_out[:, None, None, :].astype(h.dtype)
            h = GroupNorm32(name="out_norm")(h)
        h = conv3x3(self.out_channels, self.dtype, zero_init=True, name="out_conv")(
            nn.silu(h)
        )
        if in_ch == self.out_channels:
            skip = x
        else:
            skip = conv1x1(self.out_channels, self.dtype, name="skip")(x)
        return skip + h


class Downsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None):
        from .layers import _conv_impl

        return nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            conv_general_dilated=_conv_impl(True),
            name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv3x3(self.out_channels, self.dtype, name="conv")(
            nearest_upsample_2x(x)
        )


class EncoderBlock(nn.Module):
    """ResBlock + optional SpatialTransformer (one UNet input block)."""

    out_channels: int
    attn: bool
    num_head_channels: int
    context_dim: int
    transformer_depth: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        h = ResBlock(self.out_channels, dtype=self.dtype, name="res")(x, emb)
        if self.attn:
            heads = self.out_channels // self.num_head_channels
            h = SpatialTransformer(
                channels=self.out_channels,
                heads=heads,
                dim_head=self.num_head_channels,
                context_dim=self.context_dim,
                depth=self.transformer_depth,
                dtype=self.dtype,
                name="attn",
            )(h, context)
        return h


class DecoderBlock(nn.Module):
    """ResBlock + optional attn + optional upsample (one UNet output block)."""

    out_channels: int
    attn: bool
    upsample: bool
    num_head_channels: int
    context_dim: int
    transformer_depth: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        h = ResBlock(self.out_channels, dtype=self.dtype, name="res")(x, emb)
        if self.attn:
            heads = self.out_channels // self.num_head_channels
            h = SpatialTransformer(
                channels=self.out_channels,
                heads=heads,
                dim_head=self.num_head_channels,
                context_dim=self.context_dim,
                depth=self.transformer_depth,
                dtype=self.dtype,
                name="attn",
            )(h, context)
        if self.upsample:
            h = Upsample(self.out_channels, dtype=self.dtype, name="up")(h)
        return h


class MiddleBlock(nn.Module):
    channels: int
    num_head_channels: int
    context_dim: int
    transformer_depth: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        h = ResBlock(self.channels, dtype=self.dtype, name="res1")(x, emb)
        h = SpatialTransformer(
            channels=self.channels,
            heads=self.channels // self.num_head_channels,
            dim_head=self.num_head_channels,
            context_dim=self.context_dim,
            depth=self.transformer_depth,
            dtype=self.dtype,
            name="attn",
        )(h, context)
        return ResBlock(self.channels, dtype=self.dtype, name="res2")(h, emb)


def _encoder_plan(cfg: UNetConfig):
    """Static plan of the encoder tower: list of ('conv'|'block'|'down', out_ch, attn).

    Mirrors the construction loop of the reference UNet so checkpoint
    conversion can walk both in lockstep.
    """
    plan = [("conv", cfg.model_channels, False)]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            plan.append(("block", ch, ds in cfg.attention_resolutions))
        if level != len(cfg.channel_mult) - 1:
            plan.append(("down", ch, False))
            ds *= 2
    return plan


def _decoder_plan(cfg: UNetConfig):
    """Static plan of the decoder tower: list of (out_ch, attn, upsample)."""
    ds = 2 ** (len(cfg.channel_mult) - 1)
    plan = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ch = cfg.model_channels * mult
            attn = ds in cfg.attention_resolutions
            upsample = level > 0 and i == cfg.num_res_blocks
            plan.append((ch, attn, upsample))
            if upsample:
                ds //= 2
    return plan


class UNetModel(nn.Module):
    """SD UNet; optionally consumes ControlNet residuals and taps decoder feats.

    __call__(x, t, context, control=None, extract_features=False)
      x: [B, H, W, in_channels] latent (NHWC), t: [B] int32,
      context: [B, 77, context_dim] CLIP embedding,
      control: optional tuple of 13 residuals (12 encoder-skip + 1 middle).
    Returns eps [B, H, W, out_channels], and feats tuple if requested.
    """

    cfg: UNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        control: Optional[Sequence[jnp.ndarray]] = None,
        extract_features: bool = False,
    ):
        cfg = self.cfg
        maybe_remat = nn.remat if cfg.use_checkpoint else (lambda m: m)
        emb = TimestepEmbedder(cfg.model_channels, self.dtype, name="time_embed")(t)
        emb = emb.astype(self.dtype)
        context = context.astype(self.dtype)
        h = x.astype(self.dtype)

        hs = []
        for i, (kind, out_ch, attn) in enumerate(_encoder_plan(cfg)):
            if kind == "conv":
                h = conv3x3(out_ch, self.dtype, name="in_conv")(h)
            elif kind == "down":
                h = Downsample(out_ch, dtype=self.dtype, name=f"in_{i}")(h)
            else:
                h = maybe_remat(EncoderBlock)(
                    out_channels=out_ch,
                    attn=attn,
                    num_head_channels=cfg.num_head_channels,
                    context_dim=cfg.context_dim,
                    transformer_depth=cfg.transformer_depth,
                    dtype=self.dtype,
                    name=f"in_{i}",
                )(h, emb, context)
            hs.append(h)

        h = maybe_remat(MiddleBlock)(
            channels=h.shape[-1],
            num_head_channels=cfg.num_head_channels,
            context_dim=cfg.context_dim,
            transformer_depth=cfg.transformer_depth,
            dtype=self.dtype,
            name="middle",
        )(h, emb, context)

        ctrl = list(control) if control is not None else None
        if ctrl is not None:
            h = h + ctrl.pop().astype(h.dtype)

        feats = []
        extract_idx = set(cfg.extract_idx)
        for i, (out_ch, attn, upsample) in enumerate(_decoder_plan(cfg)):
            skip = hs.pop()
            if ctrl is not None:
                skip = skip + ctrl.pop().astype(skip.dtype)
            h = jnp.concatenate([h, skip], axis=-1)
            h = maybe_remat(DecoderBlock)(
                out_channels=out_ch,
                attn=attn,
                upsample=upsample,
                num_head_channels=cfg.num_head_channels,
                context_dim=cfg.context_dim,
                transformer_depth=cfg.transformer_depth,
                dtype=self.dtype,
                name=f"out_{i}",
            )(h, emb, context)
            if extract_features and i in extract_idx:
                feats.append(h)

        h = nn.silu(GroupNorm32(name="out_norm")(h))
        eps = conv3x3(cfg.out_channels, self.dtype, zero_init=True, name="out_conv")(h)
        eps = eps.astype(x.dtype)
        if extract_features:
            return eps, tuple(feats)
        return eps


class ControlNet(nn.Module):
    """UNet-encoder copy with hint concat; emits 13 zero-conv residuals.

    __call__(x, hint, t, context) -> tuple of 13 NHWC tensors
    (one per encoder block output + middle block output).
    """

    cfg: UNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hint, t, context):
        cfg = self.cfg
        maybe_remat = nn.remat if cfg.use_checkpoint else (lambda m: m)
        emb = TimestepEmbedder(cfg.model_channels, self.dtype, name="time_embed")(t)
        emb = emb.astype(self.dtype)
        context = context.astype(self.dtype)
        h = jnp.concatenate([x, hint], axis=-1).astype(self.dtype)

        outs = []
        for i, (kind, out_ch, attn) in enumerate(_encoder_plan(cfg)):
            if kind == "conv":
                h = conv3x3(out_ch, self.dtype, name="in_conv")(h)
            elif kind == "down":
                h = Downsample(out_ch, dtype=self.dtype, name=f"in_{i}")(h)
            else:
                h = maybe_remat(EncoderBlock)(
                    out_channels=out_ch,
                    attn=attn,
                    num_head_channels=cfg.num_head_channels,
                    context_dim=cfg.context_dim,
                    transformer_depth=cfg.transformer_depth,
                    dtype=self.dtype,
                    name=f"in_{i}",
                )(h, emb, context)
            outs.append(
                conv1x1(h.shape[-1], self.dtype, zero_init=True, name=f"zero_{i}")(h)
            )

        h = maybe_remat(MiddleBlock)(
            channels=h.shape[-1],
            num_head_channels=cfg.num_head_channels,
            context_dim=cfg.context_dim,
            transformer_depth=cfg.transformer_depth,
            dtype=self.dtype,
            name="middle",
        )(h, emb, context)
        outs.append(
            conv1x1(h.shape[-1], self.dtype, zero_init=True, name="middle_out")(h)
        )
        return tuple(outs)
