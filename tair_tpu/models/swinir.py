"""SwinIR restoration cleaner (Flax, NHWC, TPU-first).

Capability parity with /root/reference/terediff/model/swinir.py:624-905 in
the configuration TAIR uses (frozen stage-1 cleaner): pixel-unshuffle x8
input, embed 180, 8 RSTB layers of depth 6, window 8, mlp_ratio 2,
'nearest+conv' x8 upsampler, '1conv' residual connection, img_range 1.

TPU design notes:
  - window partition/merge are pure reshape/transposes (no gathers);
  - all windows across batch and space fold into one big attention batch so
    the MXU sees [B*nW, 64, C] matmuls;
  - the relative-position-bias index is a static numpy table baked at trace
    time; shifted windows use jnp.roll plus a statically precomputed
    additive mask;
  - stochastic depth is omitted (the TAIR cleaner is frozen/inference-only;
    training this module uses plain SGD without drop-path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import conv3x3, dense

Dtype = Any


@dataclass(frozen=True)
class SwinIRConfig:
    in_chans: int = 3
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    sf: int = 8
    img_range: float = 1.0
    unshuffle: bool = True
    unshuffle_scale: int = 8
    num_feat: int = 64


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC space-to-depth matching torch.PixelUnshuffle channel ordering.

    torch output channel layout is (c, dy, dx) fastest-last, i.e.
    out[c*r*r + dy*r + dx] = in[c] at offset (dy, dx).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h', w', c, dy, dx
    return x.reshape(b, h // r, w // r, c * r * r)


def _rel_pos_index(window: int) -> np.ndarray:
    """Static [w*w, w*w] index into the (2w-1)^2 relative position table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Static additive mask [nW, N, N] for shifted-window attention."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*nW, window*window, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_merge(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


class WindowAttention(nn.Module):
    heads: int
    window: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        """x: [B_, N, C] windows; mask: None or [nW, N, N] additive."""
        b_, n, c = x.shape
        head_dim = c // self.heads
        qkv = dense(3 * c, self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b_, n, 3, self.heads, head_dim), 3, axis=2)
        q = q[:, :, 0].transpose(0, 2, 1, 3)  # [B_, H, N, d]
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)

        table = self.param(
            "rel_pos_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.heads),
            jnp.float32,
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads)
        bias = bias.transpose(2, 0, 1)[None]  # [1, H, N, N]

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (head_dim**-0.5)
        logits = logits + bias
        if mask is not None:
            n_w = mask.shape[0]
            logits = logits.reshape(-1, n_w, self.heads, n, n) + mask[None, :, None]
            logits = logits.reshape(-1, self.heads, n, n)
        attn = nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return dense(c, self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm1")(x)
        y = y.astype(self.dtype)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, self.window, self.shift))
        else:
            mask = None
        wins = window_partition(y, self.window)
        wins = WindowAttention(self.heads, self.window, self.dtype, name="attn")(
            wins, mask
        )
        y = window_merge(wins, self.window, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y

        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm2")(x)
        y = dense(int(c * self.mlp_ratio), self.dtype, name="mlp_fc1")(
            y.astype(self.dtype)
        )
        y = nn.gelu(y, approximate=False)
        y = dense(c, self.dtype, name="mlp_fc2")(y)
        return x + y


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth SwinBlocks + 3x3 conv + skip."""

    depth: int
    heads: int
    window: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.depth):
            y = SwinBlock(
                heads=self.heads,
                window=self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"block_{i}",
            )(y)
        y = conv3x3(x.shape[-1], self.dtype, name="conv")(y)
        return x + y


class SwinIR(nn.Module):
    """Degraded 512^2 RGB [0,1] -> clean 512^2 RGB [0,1] (TAIR config)."""

    cfg: SwinIRConfig = SwinIRConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype) if cfg.in_chans == 3 else 0.0
        x = (x - mean) * cfg.img_range

        if cfg.unshuffle:
            h = pixel_unshuffle(x, cfg.unshuffle_scale)
        else:
            h = x
        h = conv3x3(cfg.embed_dim, self.dtype, name="conv_first")(h.astype(self.dtype))

        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="patch_norm")(h)
        y = y.astype(self.dtype)
        for li, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            y = RSTB(
                depth=depth,
                heads=heads,
                window=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                name=f"layer_{li}",
            )(y)
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(y)
        h = h + conv3x3(cfg.embed_dim, self.dtype, name="conv_after_body")(
            y.astype(self.dtype)
        )

        # nearest+conv reconstruction tail
        nf = cfg.num_feat
        h = nn.leaky_relu(
            conv3x3(nf, self.dtype, name="conv_before_upsample")(h), 0.01
        )
        ups = {
            2: ("conv_up1",),
            4: ("conv_up1", "conv_up2"),
            8: ("conv_up1", "conv_up2", "conv_up3"),
        }[cfg.sf]
        for name in ups:
            b, hh, ww, c = h.shape
            h = h[:, :, None, :, None, :]
            h = jnp.broadcast_to(h, (b, hh, 2, ww, 2, c)).reshape(b, hh * 2, ww * 2, c)
            h = nn.leaky_relu(conv3x3(nf, self.dtype, name=name)(h), 0.2)
        h = nn.leaky_relu(conv3x3(nf, self.dtype, name="conv_hr")(h), 0.2)
        out = conv3x3(cfg.in_chans, self.dtype, name="conv_last")(h)

        out = out.astype(jnp.float32) / cfg.img_range + mean
        return out
