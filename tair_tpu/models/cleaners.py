"""Alternative stage-1 cleaners: BSRNet (RRDBNet) and SCUNet (Flax, NHWC).

Capability parity with /root/reference/terediff/model/bsrnet.py:36-104
(residual-in-residual dense blocks, x2/x4 nearest+conv upsampling) and
scunet.py:9-264 (swin-conv UNet denoiser: parallel conv / window-attention
branches fused by 1x1 convs, strided-conv down / transposed-conv up). These
are DiffBIR cleaner options not used by the TAIR configs but part of the
framework's model inventory; both reuse the SwinIR window-attention
machinery where applicable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import conv3x3, nearest_upsample_2x
from .swinir import SwinBlock

Dtype = Any


class ResidualDenseBlock5C(nn.Module):
    nf: int
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = x
        outs = []
        for i in range(4):
            y = conv3x3(self.gc, self.dtype, name=f"conv{i + 1}")(feats)
            y = nn.leaky_relu(y, 0.2)
            outs.append(y)
            feats = jnp.concatenate([feats, y], axis=-1)
        y = conv3x3(self.nf, self.dtype, name="conv5")(feats)
        return y * 0.2 + x


class RRDB(nn.Module):
    nf: int
    gc: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(3):
            y = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name=f"rdb{i + 1}")(y)
        return y * 0.2 + x


@dataclass(frozen=True)
class RRDBNetConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    sf: int = 4


class RRDBNet(nn.Module):
    """BSRNet/BSRGAN super-resolver (bsrnet.py:75-104)."""

    cfg: RRDBNetConfig = RRDBNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        fea = conv3x3(cfg.nf, self.dtype, name="conv_first")(x.astype(self.dtype))
        trunk = fea
        for i in range(cfg.nb):
            trunk = RRDB(cfg.nf, cfg.gc, self.dtype, name=f"rrdb_{i}")(trunk)
        fea = fea + conv3x3(cfg.nf, self.dtype, name="trunk_conv")(trunk)

        fea = nn.leaky_relu(
            conv3x3(cfg.nf, self.dtype, name="upconv1")(nearest_upsample_2x(fea)), 0.2
        )
        if cfg.sf == 4:
            fea = nn.leaky_relu(
                conv3x3(cfg.nf, self.dtype, name="upconv2")(nearest_upsample_2x(fea)),
                0.2,
            )
        out = conv3x3(cfg.out_nc, self.dtype, name="conv_last")(
            nn.leaky_relu(conv3x3(cfg.nf, self.dtype, name="hr_conv")(fea), 0.2)
        )
        return out


class ConvTransBlock(nn.Module):
    """Parallel conv branch + swin-transformer branch, fused by 1x1 convs
    (scunet.py:124-161)."""

    conv_dim: int
    trans_dim: int
    head_dim: int
    window: int
    shifted: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        total = self.conv_dim + self.trans_dim
        y = nn.Conv(total, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1_1")(x)
        conv_x, trans_x = jnp.split(y, [self.conv_dim], axis=-1)

        c = nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="cb1")(conv_x)
        c = nn.relu(c)
        c = nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="cb2")(c)
        conv_x = conv_x + c

        trans_x = SwinBlock(
            heads=self.trans_dim // self.head_dim,
            window=self.window,
            shift=self.window // 2 if self.shifted else 0,
            mlp_ratio=4.0,
            dtype=self.dtype,
            name="trans",
        )(trans_x)

        res = nn.Conv(total, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1_2")(
            jnp.concatenate([conv_x, trans_x], axis=-1)
        )
        return x + res


@dataclass(frozen=True)
class SCUNetConfig:
    in_nc: int = 3
    dim: int = 64
    config: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2)
    head_dim: int = 32
    window: int = 8


class SCUNet(nn.Module):
    """Swin-conv UNet denoiser (scunet.py:163-264); input padded to /64."""

    cfg: SCUNetConfig = SCUNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x0):
        cfg = self.cfg
        b, h, w, _ = x0.shape
        ph, pw = (-h) % 64, (-w) % 64
        x0 = jnp.pad(x0, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        x0 = x0.astype(self.dtype)
        d = cfg.dim

        def stack(x, n, cdim, name):
            for i in range(n):
                x = ConvTransBlock(
                    cdim, cdim, cfg.head_dim, cfg.window, shifted=bool(i % 2),
                    dtype=self.dtype, name=f"{name}_{i}",
                )(x)
            return x

        def down(x, out_ch, name):
            return nn.Conv(out_ch, (2, 2), strides=(2, 2), use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32, name=name)(x)

        def up(x, out_ch, name):
            # transpose_kernel=True + [kh,kw,out,in] layout matches torch
            # ConvTranspose2d semantics exactly (verified vs scunet.py m_up*)
            return nn.ConvTranspose(out_ch, (2, 2), strides=(2, 2), use_bias=False,
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    transpose_kernel=True, name=name)(x)

        x1 = nn.Conv(d, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="head")(x0)
        x2 = down(stack(x1, cfg.config[0], d // 2, "down1"), 2 * d, "down1_conv")
        x3 = down(stack(x2, cfg.config[1], d, "down2"), 4 * d, "down2_conv")
        x4 = down(stack(x3, cfg.config[2], 2 * d, "down3"), 8 * d, "down3_conv")
        xb = stack(x4, cfg.config[3], 4 * d, "body")
        y = stack(up(xb + x4, 4 * d, "up3_conv"), cfg.config[4], 2 * d, "up3")
        y = stack(up(y + x3, 2 * d, "up2_conv"), cfg.config[5], d, "up2")
        y = stack(up(y + x2, d, "up1_conv"), cfg.config[6], d // 2, "up1")
        out = nn.Conv(cfg.in_nc, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32, name="tail")(y + x1)
        return out[:, :h, :w].astype(jnp.float32)
