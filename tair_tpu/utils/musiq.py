"""MUSIQ: Multi-scale Image Quality Transformer (no-reference IQA).

Counterpart of the reference's `pyiqa.create_metric('musiq')`
(/root/reference/val.py:73). Architecture (Ke et al., ICCV 2021): the image
is represented at multiple scales — native resolution plus aspect-ratio-
preserving resizes to longer side 384 and 224 — every scale is cut into
32x32 patches, each patch is encoded by a 5-layer BiT-style mini-ResNet
(weight-standardized convs + GroupNorm: root conv + one pre-activation
bottleneck) and linearly projected, patches get a hash-based 2D spatial
embedding (G=10 grid, shared across scales so resolutions align) plus a
per-scale embedding, and a CLS-token transformer (D=384, 14 layers, 6
heads, MLP 1152) regresses the quality score from the CLS output.

RECONSTRUCTION STATUS: neither pyiqa nor the google-research/musiq source
is available in this environment. The compute graph follows the paper's
architecture description; `from_torch` accepts this module's documented
layout (tests/test_musiq.py pins a torch mirror to it) AND published-style
layouts through the role-based key-rename shim in weights/musiq_shim.py
(round-trip-tested in tests/test_musiq_shim.py; unknown namings raise
listing the unmatched keys). A one-image cross-check against pyiqa is
still required before absolute values are trusted
(docs/METRIC_WEIGHTS.md).

TPU notes: each (H, W) traces its own static multi-scale patch grid — no
dynamic shapes, no attention masking (the TF implementation pads token
sequences to a fixed budget and masks; scoring per-shape makes every patch
slot real). Scales whose token count exceeds `max_tokens_per_scale` are
center-cropped in patch space, mirroring the TF sequence budget.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

PATCH = 32


def _dense(f, name):
    return nn.Dense(f, param_dtype=jnp.float32, name=name)


def _ln(name):
    return nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name=name)


class StdConv(nn.Module):
    """Weight-standardized conv (BiT): kernel normalized over (kh, kw, in)
    per output channel at apply time."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh = kw = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        mu = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)
        w = (w - mu) / jnp.sqrt(var + 1e-10)
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w,
            window_strides=(self.stride, self.stride),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return out


def _gn(name, groups=32):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-4,
                        param_dtype=jnp.float32, name=name)


class PreActBottleneck(nn.Module):
    """BiT pre-activation bottleneck: gn->relu before each conv; projection
    shortcut from the pre-activated input when widths change."""

    mid: int

    @nn.compact
    def __call__(self, x):
        out_ch = self.mid * 4
        groups = min(32, x.shape[-1])
        h = nn.relu(_gn("gn1", groups)(x))
        shortcut = x
        if x.shape[-1] != out_ch:
            shortcut = StdConv(out_ch, 1, name="proj")(h)
        y = StdConv(self.mid, 1, name="conv1")(h)
        y = nn.relu(_gn("gn2", min(32, self.mid))(y))
        y = StdConv(self.mid, 3, name="conv2")(y)
        y = nn.relu(_gn("gn3", min(32, self.mid))(y))
        y = StdConv(out_ch, 1, name="conv3")(y)
        return shortcut + y


class PatchEncoder(nn.Module):
    """The paper's 5-layer mini-ResNet over one 32x32 patch -> [D] vector:
    root StdConv 7x7/2 + GN + ReLU + maxpool 3x3/2, one pre-act bottleneck,
    final GN+ReLU, flatten, linear projection."""

    root_width: int = 64
    hidden: int = 384

    @nn.compact
    def __call__(self, patches):  # [N, 32, 32, 3]
        x = StdConv(self.root_width, 7, 2, name="root")(patches)
        x = nn.relu(_gn("root_gn", min(32, self.root_width))(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))          # [N, 8, 8, 64]
        x = PreActBottleneck(self.root_width, name="block1")(x)
        x = nn.relu(_gn("out_gn", min(32, self.root_width))(x))
        n = x.shape[0]
        # flatten in torch CHW order: the embedding weight in a converted
        # checkpoint indexes channels-major features
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)
        return _dense(self.hidden, "embedding")(x)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp: int

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
        h = _dense(self.mlp, "fc1")(h)
        h = _dense(d, "fc2")(nn.gelu(h, approximate=False))
        return x + h


@dataclass(frozen=True)
class MUSIQConfig:
    hidden: int = 384
    layers: int = 14
    heads: int = 6
    mlp: int = 1152
    root_width: int = 64
    hash_grid: int = 10                 # G: shared spatial hash grid
    scales: Tuple[int, ...] = (384, 224)  # longer-side resizes (+ native)
    max_tokens_per_scale: int = 512
    num_outputs: int = 1


class MUSIQBackbone(nn.Module):
    """Token transformer over pre-encoded patch tokens.

    tokens: [B, T, D] patch embeddings; hash_idx [T] int32 spatial-hash slot
    per token; scale_idx [T] int32 scale id per token.
    """

    cfg: MUSIQConfig = MUSIQConfig()

    @nn.compact
    def __call__(self, tokens, hash_idx, scale_idx):
        cfg = self.cfg
        b, t, d = tokens.shape
        spatial = self.param(
            "spatial_embedding", nn.initializers.normal(0.02),
            (cfg.hash_grid * cfg.hash_grid, d), jnp.float32,
        )
        scale = self.param(
            "scale_embedding", nn.initializers.normal(0.02),
            (len(cfg.scales) + 1, d), jnp.float32,
        )
        x = tokens + spatial[hash_idx][None] + scale[scale_idx][None]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d),
                         jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), x], axis=1)
        for i in range(cfg.layers):
            x = TransformerBlock(d, cfg.heads, cfg.mlp, name=f"block_{i}")(x)
        x = _ln("encoder_norm")(x)
        return _dense(cfg.num_outputs, "head")(x[:, 0])[..., 0]  # [B]


class MUSIQ(nn.Module):
    """Full multi-scale model over a [B, H, W, 3] image in [0, 1]."""

    cfg: MUSIQConfig = MUSIQConfig()

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        b, h, w, _ = images.shape
        x = images * 2.0 - 1.0  # TF MUSIQ normalizes to [-1, 1]

        all_tokens, all_hash, all_scale = [], [], []
        encoder = PatchEncoder(cfg.root_width, cfg.hidden, name="patch_encoder")
        for sid, img in enumerate(_multiscale(x, cfg.scales)):
            ph = (-img.shape[1]) % PATCH
            pw = (-img.shape[2]) % PATCH
            img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
            gh, gw = img.shape[1] // PATCH, img.shape[2] // PATCH
            gh, gw, img = _crop_to_budget(img, gh, gw, cfg.max_tokens_per_scale)
            patches = img.reshape(b, gh, PATCH, gw, PATCH, 3)
            patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
                b * gh * gw, PATCH, PATCH, 3
            )
            tok = encoder(patches).reshape(b, gh * gw, cfg.hidden)
            g = cfg.hash_grid
            hi = np.minimum((np.arange(gh) * g) // gh, g - 1)
            hj = np.minimum((np.arange(gw) * g) // gw, g - 1)
            hash_idx = (hi[:, None] * g + hj[None, :]).reshape(-1)
            all_tokens.append(tok)
            all_hash.append(hash_idx)
            all_scale.append(np.full(gh * gw, sid, np.int32))

        tokens = jnp.concatenate(all_tokens, axis=1)
        hash_idx = jnp.asarray(np.concatenate(all_hash).astype(np.int32))
        scale_idx = jnp.asarray(np.concatenate(all_scale))
        return MUSIQBackbone(cfg, name="backbone")(tokens, hash_idx, scale_idx)


def _multiscale(x, scales):
    """Native + aspect-ratio-preserving resizes to each longer side."""
    b, h, w, c = x.shape
    out = [x]
    for sid, longer in enumerate(scales):
        s = longer / max(h, w)
        nh, nw = max(1, int(round(h * s))), max(1, int(round(w * s)))
        out.append(jax.image.resize(x, (b, nh, nw, c), "bilinear"))
    return out


def _crop_to_budget(img, gh, gw, budget):
    """Center-crop the patch grid when gh*gw exceeds the token budget
    (the TF implementation's fixed sequence budget)."""
    while gh * gw > budget:
        if gh >= gw:
            gh -= 1
        else:
            gw -= 1
    h, w = gh * PATCH, gw * PATCH
    oh = (img.shape[1] - h) // 2 // PATCH * PATCH
    ow = (img.shape[2] - w) // 2 // PATCH * PATCH
    return gh, gw, img[:, oh : oh + h, ow : ow + w]


# --------------------------------------------------------------------------
# metric wrapper
# --------------------------------------------------------------------------


class MUSIQMetric:
    """musiq(images) -> [B]; higher is better. Images [B,H,W,3] in [0,1]."""

    def __init__(self, params, cfg: MUSIQConfig = MUSIQConfig()):
        self.net = MUSIQ(cfg)
        self.params = params
        self.cfg = cfg
        self._apply = jax.jit(lambda p, x: self.net.apply({"params": p}, x))

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.params, images)

    @classmethod
    def from_torch(cls, path: str, **kw) -> "MUSIQMetric":
        """path: torch checkpoint in this module's documented layout OR any
        published-layout state dict covered by the key-rename shim
        (weights/musiq_shim.py) — e.g. pyiqa's `musiq_koniq_ckpt.pth`
        naming families. Unrecognized layouts raise with the leftover keys."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict):
            for wrapper in ("state_dict", "params", "model"):
                if wrapper in sd and isinstance(sd[wrapper], dict):
                    sd = sd[wrapper]
                    break
        return cls.from_state_dict(sd, **kw)

    @classmethod
    def from_state_dict(cls, sd, scales=None, heads=None, **kw) -> "MUSIQMetric":
        """Most geometry is inferred from the checkpoint; head count and the
        resize scale list are NOT recoverable from weight shapes — they
        default to the paper values (hidden/64 heads; longer sides 384, 224)
        and can be overridden for non-standard models."""
        from ..weights.convert import convert_musiq
        from ..weights.musiq_shim import shim_musiq_state_dict

        sd = shim_musiq_state_dict(sd)
        sd = {k: np.asarray(v.float().numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        hidden = sd["backbone.cls_token"].shape[-1]
        layers = 0
        while f"backbone.blocks.{layers}.norm1.weight" in sd:
            layers += 1
        g2 = sd["backbone.spatial_embedding"].shape[0]
        n_scales = sd["backbone.scale_embedding"].shape[0] - 1
        root = sd["patch_encoder.root.weight"].shape[0]
        if scales is not None:
            scales = tuple(scales)
        else:
            scales = MUSIQConfig().scales
        if len(scales) != n_scales:
            raise ValueError(
                f"checkpoint has {n_scales} resize scales (scale_embedding "
                f"rows - 1) but scales={scales}; pass the model's longer-side "
                "list explicitly via from_state_dict(scales=...)"
            )
        cfg = MUSIQConfig(
            hidden=hidden, layers=layers,
            heads=heads if heads is not None else max(1, hidden // 64),
            mlp=sd["backbone.blocks.0.mlp.fc1.weight"].shape[0],
            root_width=root, hash_grid=int(round(g2 ** 0.5)),
            scales=scales,
            num_outputs=sd["backbone.head.weight"].shape[0],
        )
        return cls(convert_musiq(sd, cfg), cfg, **kw)
