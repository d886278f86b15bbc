"""CLIP-IQA: no-reference image quality via CLIP RN50 prompt pairs.

Counterpart of the reference's `pyiqa.create_metric('clipiqa')`
(/root/reference/val.py:75): the CLIP-IQA formulation (Wang et al., AAAI'23)
scores an image by the softmax over the cosine similarities of its CLIP
image embedding with an antonym prompt pair ("Good photo." / "Bad photo.").

Implements OpenAI CLIP's ModifiedResNet-50 image tower natively in Flax
(NHWC, inference-mode BatchNorm): 3-conv stem with blur-free avg-pool
downsampling, 4 bottleneck stages with avg-pool strides, and the
attention-pool head. The text side reuses models/clip.py's text tower
(width 512 / 12 layers, "last" mode) + EOT pooling and text projection.

The LEARNED weights are external (docs/METRIC_WEIGHTS.md): a CLIP RN50
state dict (openai CLIP `RN50.pt`'s state_dict or the pyiqa re-export).
Load with `CLIPIQAMetric.from_torch(path)`.

Arbitrary input sizes: CLIP-IQA removes the fixed 7x7 attention-pool
positional embedding so images are scored at native resolution; this
implementation supports that (`pos_embedding="none"`, the paper's choice)
and bilinear interpolation of the grid embedding (`"interpolate"`, default —
closer to the pretrained model's behavior at mild size changes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# CLIP preprocessing constants (openai/CLIP clip/clip.py _transform)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

DEFAULT_PROMPTS = ("Good photo.", "Bad photo.")


class BNInfer(nn.Module):
    """Inference-mode BatchNorm: affine transform with frozen statistics."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x.astype(jnp.float32) - mean) * inv + bias


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck: all convs stride 1, an avg-pool
    performs the stride after conv2 (openai/CLIP model.py Bottleneck)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(BNInfer(name="bn1")(
            _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)))
        out = nn.relu(BNInfer(name="bn2")(
            _conv(self.planes, 3, name="conv2", dtype=self.dtype)(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = BNInfer(name="bn3")(
            _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out))

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            identity = x if self.stride == 1 else _avg_pool(x, self.stride)
            identity = BNInfer(name="down_bn")(
                _conv(self.planes * 4, 1, name="down_conv", dtype=self.dtype)(identity)
            )
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """CLIP's attention pooling: mean token queries the spatial tokens
    (openai/CLIP model.py AttentionPool2d). pos_embedding: "interpolate"
    resizes the 7x7 grid embedding to the feature grid; "none" drops it
    (the CLIP-IQA paper's arbitrary-resolution variant)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    pos_embedding: str = "interpolate"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, 1+HW, C]

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c ** -0.5),
            (self.spacial_dim ** 2 + 1, c), jnp.float32,
        )
        if self.pos_embedding != "none":
            grid = pos[1:].reshape(self.spacial_dim, self.spacial_dim, c)
            if (h, w) != (self.spacial_dim, self.spacial_dim):
                grid = jax.image.resize(grid, (h, w, c), "bilinear")
            pos_hw = jnp.concatenate([pos[:1], grid.reshape(h * w, c)], axis=0)
            tokens = tokens + pos_hw[None].astype(tokens.dtype)

        dense = lambda f, name: nn.Dense(
            f, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(c, "q_proj")(tokens[:, :1])           # [B, 1, C]
        k = dense(c, "k_proj")(tokens)                  # [B, T, C]
        v = dense(c, "v_proj")(tokens)

        hd = c // self.num_heads
        split = lambda t: t.reshape(b, t.shape[1], self.num_heads, hd)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = out.reshape(b, 1, c)
        return dense(self.output_dim, "c_proj")(out)[:, 0]  # [B, output_dim]


@dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)   # RN50
    width: int = 64
    embed_dim: int = 1024
    heads: int = 32
    image_size: int = 224                     # sets the pos-emb grid (7x7)
    pos_embedding: str = "interpolate"


class ModifiedResNet(nn.Module):
    """CLIP's ResNet (openai/CLIP model.py ModifiedResNet): 3-conv stem,
    avg-pool (not strided-conv/maxpool) downsampling, attention-pool head."""

    cfg: ModifiedResNetConfig = ModifiedResNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] CLIP-normalized
        cfg = self.cfg
        w = cfg.width
        x = nn.relu(BNInfer(name="bn1")(
            _conv(w // 2, 3, 2, name="conv1", dtype=self.dtype)(x)))
        x = nn.relu(BNInfer(name="bn2")(
            _conv(w // 2, 3, name="conv2", dtype=self.dtype)(x)))
        x = nn.relu(BNInfer(name="bn3")(
            _conv(w, 3, name="conv3", dtype=self.dtype)(x)))
        x = _avg_pool(x, 2)

        for stage, n_blocks in enumerate(cfg.layers):
            planes = w * (2 ** stage)
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = Bottleneck(
                    planes, stride, self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(x)

        return AttentionPool2d(
            spacial_dim=cfg.image_size // 32,
            embed_dim=w * 8 * 4,
            num_heads=cfg.heads,
            output_dim=cfg.embed_dim,
            pos_embedding=cfg.pos_embedding,
            dtype=self.dtype,
            name="attnpool",
        )(x)


# --------------------------------------------------------------------------
# metric wrapper
# --------------------------------------------------------------------------


class CLIPIQAMetric:
    """clipiqa(images) -> [B] in (0, 1); higher is better quality.

    Built from a CLIP RN50 state dict; the antonym text embeddings are
    precomputed once at load time. Images: [B, H, W, 3] float in [0, 1],
    native resolution (see module docstring on positional embeddings).
    """

    def __init__(self, visual_params, text_emb, logit_scale=100.0,
                 cfg: ModifiedResNetConfig = ModifiedResNetConfig()):
        self.visual = ModifiedResNet(cfg)
        self.visual_params = visual_params
        self.text_emb = text_emb          # [2, embed_dim], L2-normalized
        self.logit_scale = float(logit_scale)
        # one compiled program per image shape, reused across a directory
        self._apply = jax.jit(
            lambda p, x: self.visual.apply({"params": p}, x)
        )

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(CLIP_MEAN)
        std = jnp.asarray(CLIP_STD)
        x = (images - mean) / std
        feat = self._apply(self.visual_params, x)
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
        logits = self.logit_scale * feat @ self.text_emb.T    # [B, 2]
        return jax.nn.softmax(logits, axis=-1)[:, 0]

    @classmethod
    def from_torch(
        cls,
        clip_rn50_path: str,
        prompts: Sequence[str] = DEFAULT_PROMPTS,
        pos_embedding: str = "interpolate",
    ) -> "CLIPIQAMetric":
        """clip_rn50_path: torch state dict of openai CLIP RN50 (the
        `RN50.pt` TorchScript archive's state_dict() or a plain re-save)."""
        import torch

        sd = torch.load(clip_rn50_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v for k, v in sd.items()}
        return cls.from_state_dict(sd, prompts, pos_embedding)

    @classmethod
    def from_state_dict(cls, sd, prompts=DEFAULT_PROMPTS,
                        pos_embedding: str = "interpolate") -> "CLIPIQAMetric":
        import numpy as np

        from ..models.clip import CLIPTextConfig, CLIPTextTower
        from ..models.tokenizer import tokenize
        from ..weights.convert import convert_clip, convert_clip_rn50_visual

        sd = {k: np.asarray(v.float().numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        width = sd["visual.layer1.0.conv1.weight"].shape[1]
        embed_dim = sd["text_projection"].shape[1]
        n_stage_blocks = []
        for stage in range(1, 5):
            n = 0
            while f"visual.layer{stage}.{n}.conv1.weight" in sd:
                n += 1
            n_stage_blocks.append(n)
        spacial = int(round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        ))
        cfg = ModifiedResNetConfig(
            layers=tuple(n_stage_blocks), width=width, embed_dim=embed_dim,
            # OpenAI ModifiedResNet: heads = embed_width / 64 where the
            # attnpool embed width is stem_width * 32 (RN50: 64 -> 32 heads,
            # RN50x4: 80 -> 40); deriving it keeps non-RN50 checkpoints honest
            heads=width * 32 // 64,
            image_size=spacial * 32, pos_embedding=pos_embedding,
        )
        visual_params = convert_clip_rn50_visual(sd, cfg)

        # text side: OpenAI CLIP text transformer (width 512 / 12 layers for
        # RN50), run through ALL blocks + EOT pooling + projection. Original
        # OpenAI checkpoints were trained with QuickGELU, not exact GELU.
        t_width = sd["ln_final.weight"].shape[0]
        n_layers = 0
        while f"transformer.resblocks.{n_layers}.ln_1.weight" in sd:
            n_layers += 1
        tcfg = CLIPTextConfig(
            width=t_width, heads=max(1, t_width // 64), layers=n_layers,
            layer="last", act="quick_gelu",
        )
        tower = CLIPTextTower(tcfg)
        text_params, _ = convert_clip(sd, tcfg)
        tokens = jnp.asarray(tokenize(list(prompts)))
        hidden = tower.apply({"params": text_params}, tokens)   # [2, 77, W]
        eot = jnp.argmax(tokens, axis=-1)
        pooled = hidden[jnp.arange(hidden.shape[0]), eot]       # [2, W]
        text_emb = pooled @ jnp.asarray(sd["text_projection"])
        text_emb = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)

        scale = float(np.exp(sd["logit_scale"])) if "logit_scale" in sd else 100.0
        return cls(visual_params, text_emb, scale, cfg)
