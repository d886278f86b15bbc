"""MANIQA: Multi-dimension Attention Network for no-reference IQA.

Counterpart of the reference's `pyiqa.create_metric('maniqa')`
(/root/reference/val.py:74). Architecture (Yang et al., CVPRW 2022, official
IIGROUP/MANIQA repo — the network pyiqa wraps): a ViT-B/8 backbone whose
block-6..9 token features are channel-concatenated, two stages of
[Transposed Attention Blocks (channel attention) -> 1x1 conv -> Scale Swin
Transformer stage], and per-patch score/weight heads combined as a weighted
average.

RECONSTRUCTION STATUS: pyiqa is not installed and the MANIQA source is not
vendored in this environment, so this graph + the converter key layout are
reconstructed from the paper and the official repo's published architecture;
they are forward-parity-tested against a torch mirror written to the same
layout (tests/test_maniqa.py) — validating the converter conventions and the
graph plumbing, NOT the exact official checkpoint. When the external
checkpoint (`ckpt_koniq10k.pt`) is available, cross-check one image against
pyiqa before trusting absolute values (docs/METRIC_WEIGHTS.md).

Quirk preserved on purpose: the official TABlock reassembles `attn @ v`
through `.transpose(1, 2).reshape(B, C, N)` — a non-contiguous view reshape
that permutes elements (the multi-head recombine pattern applied to a
head-free tensor). Training baked the permutation into the weights, so it is
replicated here bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _dense(f, name):
    return nn.Dense(f, param_dtype=jnp.float32, name=name)


def _ln(name):
    # timm ViT passes eps=1e-6 explicitly
    return nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name=name)


def _ln5(name):
    # the swin stages keep torch's nn.LayerNorm default eps=1e-5
    return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=name)


# --------------------------------------------------------------------------
# ViT backbone (timm vit_base_patch8_224 layout), per-block feature taps
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 8
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_hidden: int

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        b, t, d = x.shape
        h = _ln("norm1")(x)
        qkv = _dense(3 * d, "qkv")(h).reshape(b, t, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d // self.heads)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        x = x + _dense(d, "proj")(o)
        h = _ln("norm2")(x)
        h = _dense(self.mlp_hidden, "fc1")(h)
        h = _dense(d, "fc2")(nn.gelu(h, approximate=False))
        return x + h


class ViTFeatures(nn.Module):
    """timm-style ViT returning every block's token output (with CLS)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(
            cfg.dim, (p, p), strides=(p, p), padding="VALID",
            param_dtype=jnp.float32, name="patch_embed",
        )(x)
        b, gh, gw, d = x.shape
        tokens = x.reshape(b, gh * gw, d)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, d), jnp.float32
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, d)), tokens], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, (cfg.img_size // p) ** 2 + 1, d), jnp.float32,
        )
        tokens = tokens + pos
        outs = []
        for i in range(cfg.depth):
            tokens = ViTBlock(
                d, cfg.heads, int(d * cfg.mlp_ratio), name=f"block_{i}"
            )(tokens)
            outs.append(tokens)
        return outs


# --------------------------------------------------------------------------
# Transposed Attention Block (channel attention; official maniqa.py TABlock)
# --------------------------------------------------------------------------


class TABlock(nn.Module):
    """Attention across the CHANNEL axis of [B, C, N] features; the q/k/v
    projections act on the spatial axis N. Replicates the official
    transpose(1,2).reshape(B,C,N) recombine (see module docstring)."""

    @nn.compact
    def __call__(self, x):  # [B, C, N]
        b, c, n = x.shape
        q = _dense(n, "c_q")(x)
        k = _dense(n, "c_k")(x)
        v = _dense(n, "c_v")(x)
        attn = jax.nn.softmax((q @ jnp.swapaxes(k, -2, -1)) * (n ** -0.5), axis=-1)
        y = attn @ v                                   # [B, C, N]
        y = jnp.swapaxes(y, 1, 2).reshape(b, c, n)     # official permute quirk
        return y + x


# --------------------------------------------------------------------------
# Scale Swin Transformer stage (official maniqa swin.py: standard Swin
# blocks, fixed-width MLP, scaled residual around each stage)
# --------------------------------------------------------------------------


def _rel_pos_index(ws: int) -> np.ndarray:
    """Standard swin relative-position index [ws^2, ws^2]."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    window: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):  # x: [nW*B, ws*ws, D]
        nwb, t, d = x.shape
        ws = self.window
        qkv = _dense(3 * d, "qkv")(x).reshape(nwb, t, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d // self.heads)
        table = self.param(
            "relative_position_bias_table", nn.initializers.normal(0.02),
            ((2 * ws - 1) ** 2, self.heads), jnp.float32,
        )
        bias = table[jnp.asarray(_rel_pos_index(ws)).reshape(-1)]
        bias = bias.reshape(t, t, self.heads).transpose(2, 0, 1)
        logits = logits + bias[None]
        if mask is not None:  # [nW, t, t]
            nw = mask.shape[0]
            logits = logits.reshape(-1, nw, self.heads, t, t) + mask[None, :, None]
            logits = logits.reshape(nwb, self.heads, t, t)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nwb, t, d)
        return _dense(d, "proj")(o)


def _window_partition(x, ws):  # [B, H, W, D] -> [B*nW, ws*ws, D]
    b, h, w, d = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, d)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, d)


def _window_reverse(x, ws, h, w):  # inverse of _window_partition
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class SwinBlock(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    heads: int
    window: int
    shift: int
    dim_mlp: int

    @nn.compact
    def __call__(self, x):  # [B, H*W, D]
        hh, ww = self.resolution
        b, t, d = x.shape
        ws, sh = self.window, self.shift

        shortcut = x
        x = _ln5("norm1")(x).reshape(b, hh, ww, d)
        if sh > 0:
            x = jnp.roll(x, (-sh, -sh), axis=(1, 2))
            mask = self._shift_mask(hh, ww, ws, sh)
        else:
            mask = None
        wins = _window_partition(x, ws)
        wins = WindowAttention(d, ws, self.heads, name="attn")(wins, mask)
        x = _window_reverse(wins, ws, hh, ww)
        if sh > 0:
            x = jnp.roll(x, (sh, sh), axis=(1, 2))
        x = shortcut + x.reshape(b, t, d)

        h = _ln5("norm2")(x)
        h = _dense(self.dim_mlp, "fc1")(h)
        h = _dense(d, "fc2")(nn.gelu(h, approximate=False))
        return x + h

    @staticmethod
    def _shift_mask(hh, ww, ws, sh):
        img = np.zeros((1, hh, ww, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
            for wsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                img[:, hs, wsl] = cnt
                cnt += 1
        wins = _window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
        diff = wins[:, None, :] - wins[:, :, None]
        return jnp.where(diff != 0, -100.0, 0.0)


class SwinStage(nn.Module):
    """One scaled swin stage (the paper's SSTB): depth blocks + scaled
    residual y = scale * blocks(x) + x."""

    dim: int
    resolution: Tuple[int, int]
    depth: int
    heads: int
    window: int
    dim_mlp: int
    scale: float

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        ws = min(self.window, min(self.resolution))
        shortcut = x
        for j in range(self.depth):
            sh = 0 if (j % 2 == 0 or ws >= min(self.resolution)) else ws // 2
            x = SwinBlock(
                self.dim, self.resolution, self.heads, ws, sh, self.dim_mlp,
                name=f"block_{j}",
            )(x)
        return self.scale * x + shortcut


# --------------------------------------------------------------------------
# MANIQA network
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class MANIQAConfig:
    vit: ViTConfig = field(default_factory=ViTConfig)
    extract_blocks: Tuple[int, ...] = (6, 7, 8, 9)
    embed_dim: int = 768          # conv1 output / stage-1 swin width
    num_tab: int = 2
    depths: Tuple[int, ...] = (2, 2)
    num_heads: Tuple[int, ...] = (4, 4)
    window_size: int = 4
    dim_mlp: int = 768
    scale: float = 0.8

    @property
    def input_size(self) -> int:
        return self.vit.img_size // self.vit.patch_size


class MANIQA(nn.Module):
    cfg: MANIQAConfig = MANIQAConfig()

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] imagenet-normalized
        cfg = self.cfg
        g = cfg.input_size
        feats = ViTFeatures(cfg.vit, name="vit")(x)
        x = jnp.concatenate(
            [feats[i][:, 1:] for i in cfg.extract_blocks], axis=2
        )                                              # [B, N, 4*Dv]
        b, n_tok, c = x.shape

        # stage 1: channel attention at full concat width
        x = jnp.swapaxes(x, 1, 2)                      # [B, C, N]
        for i in range(cfg.num_tab):
            x = TABlock(name=f"tablock1_{i}")(x)
        x = x.reshape(b, c, g, g).transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(cfg.embed_dim, (1, 1), param_dtype=jnp.float32,
                    name="conv1")(x)
        x = x.reshape(b, n_tok, cfg.embed_dim)
        for i, depth in enumerate(cfg.depths):
            x = SwinStage(
                cfg.embed_dim, (g, g), depth, cfg.num_heads[i],
                cfg.window_size, cfg.dim_mlp, cfg.scale,
                name=f"swin1_{i}",
            )(x)

        # stage 2: channel attention at embed width, half-width swin
        x = jnp.swapaxes(x, 1, 2)                      # [B, C, N]
        for i in range(cfg.num_tab):
            x = TABlock(name=f"tablock2_{i}")(x)
        x = x.reshape(b, cfg.embed_dim, g, g).transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.embed_dim // 2, (1, 1), param_dtype=jnp.float32,
                    name="conv2")(x)
        x = x.reshape(b, n_tok, cfg.embed_dim // 2)
        for i, depth in enumerate(cfg.depths):
            x = SwinStage(
                cfg.embed_dim // 2, (g, g), depth, cfg.num_heads[i],
                cfg.window_size, cfg.dim_mlp, cfg.scale,
                name=f"swin2_{i}",
            )(x)

        # weighted-average patch scores
        def head(name):
            h = nn.relu(_dense(cfg.embed_dim // 2, f"{name}_0")(x))
            return _dense(1, f"{name}_3")(h)[..., 0]   # [B, N]

        score = nn.relu(head("fc_score"))
        weight = jax.nn.sigmoid(head("fc_weight"))
        return (score * weight).sum(-1) / jnp.maximum(weight.sum(-1), 1e-12)


# --------------------------------------------------------------------------
# metric wrapper
# --------------------------------------------------------------------------


class MANIQAMetric:
    """maniqa(images) -> [B]; higher is better. Images [B,H,W,3] in [0,1].

    pyiqa inference protocol: `num_crops` random 224x224 crops per image,
    scores averaged (deterministic via the seed). Images smaller than the
    crop are edge-padded up.
    """

    def __init__(self, params, cfg: MANIQAConfig = MANIQAConfig(),
                 num_crops: int = 20, seed: int = 0):
        self.net = MANIQA(cfg)
        self.params = params
        self.cfg = cfg
        self.num_crops = num_crops
        self.seed = seed
        self._apply = jax.jit(
            lambda p, x: self.net.apply({"params": p}, x)
        )

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        size = self.cfg.vit.img_size
        b, h, w, _ = images.shape
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x = (images - mean) / std
        if h < size or w < size:
            x = jnp.pad(
                x, ((0, 0), (0, max(0, size - h)), (0, max(0, size - w)),
                    (0, 0)), mode="edge",
            )
            h, w = max(h, size), max(w, size)
        rng = np.random.RandomState(self.seed)
        draws = [
            (int(rng.randint(0, h - size + 1)), int(rng.randint(0, w - size + 1)))
            for _ in range(self.num_crops)
        ]
        # evaluate each UNIQUE crop once (a crop-sized image draws (0,0)
        # num_crops times -> one forward) as ONE batched apply, then average
        # with the draw multiplicities so the protocol mean is unchanged
        uniq = sorted(set(draws))
        counts = jnp.asarray(
            [draws.count(o) for o in uniq], jnp.float32
        )[:, None]
        crops = jnp.concatenate(
            [
                jax.lax.dynamic_slice(x, (0, i, j, 0), (b, size, size, x.shape[-1]))
                for (i, j) in uniq
            ],
            axis=0,
        )
        scores = self._apply(self.params, crops).reshape(len(uniq), b)
        return (scores * counts).sum(0) / self.num_crops

    @classmethod
    def from_torch(cls, path: str, **kw) -> "MANIQAMetric":
        """path: official MANIQA checkpoint (`ckpt_koniq10k.pt`) or the
        pyiqa re-export (state dict in the IIGROUP/MANIQA key layout)."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        return cls.from_state_dict(sd, **kw)

    @classmethod
    def from_state_dict(cls, sd, **kw) -> "MANIQAMetric":
        from ..weights.convert import convert_maniqa

        sd = {k: np.asarray(v.float().numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        vit_dim = sd["vit.patch_embed.proj.weight"].shape[0]
        depth = 0
        while f"vit.blocks.{depth}.norm1.weight" in sd:
            depth += 1
        n_tokens = sd["vit.pos_embed"].shape[1] - 1
        patch = sd["vit.patch_embed.proj.weight"].shape[-1]
        img_size = int(round(n_tokens ** 0.5)) * patch
        embed_dim = sd["conv1.weight"].shape[0]
        cfg = MANIQAConfig(
            vit=ViTConfig(
                img_size=img_size, patch_size=patch, dim=vit_dim,
                depth=depth, heads=max(1, vit_dim // 64),
            ),
            embed_dim=embed_dim,
        )
        return cls(convert_maniqa(sd, cfg), cfg, **kw)
