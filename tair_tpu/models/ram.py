"""RAM++ (Recognize Anything Plus) open-vocabulary image tagger.

Counterpart of /root/reference/terediff/utils/caption.py:152-171, where
`RAMCaptioner` wraps the external `ram` package's
`ram_plus(pretrained=..., image_size=384, vit="swin_l")` and joins the
predicted tags into the DiffBIR caption prompt. That package is not
installed here (and has no transformers port), so this module implements
the RAM++ inference graph natively:

  Swin-L image encoder (classification layout: 4x4 patch embed, stages
  [2,2,18,2] with patch merging, windows of 12 at 384^2) -> avg-pooled
  "CLS" token prepended to the 12x12 spatial tokens -> `image_proj` into
  the 512-d CLIP description space -> per-class softmax reweighting of the
  51 frozen description embeddings against the CLS embedding -> ReLU'd
  `wordvec_proj` into the 768-d tagging decoder -> 2 BERT-style layers of
  [self-attention over the class queries, cross-attention to the image
  tokens, FFN] -> per-class GroupWiseLinear logit -> sigmoid > per-class
  threshold -> tag strings.

RECONSTRUCTION STATUS: the `ram` source is not vendored in this
environment, so the graph + converter key layout are reconstructed from
the published RAM++ architecture (Huang et al., 2023; xinyu1205/
recognize-anything `ram_plus.py`) and forward-parity-tested against a
torch mirror written to the same state-dict layout (tests/test_ram.py) —
validating converter conventions and graph plumbing, NOT the exact
official checkpoint. When `ram_plus_swin_large_14m.pth` is available,
cross-check one image against the upstream package before trusting tags
(docs/METRIC_WEIGHTS.md has the same caveat taxonomy for the IQA suite).

External files to unlock the real captioner (none shipped, zero egress):
  - ram_plus_swin_large_14m.pth      (weights, incl. frozen label_embed)
  - ram_tag_list.txt                 (4585 tag strings, one per line)
  - ram_tag_list_threshold.txt       (optional per-class thresholds)

TPU notes: one jitted forward per image batch; the 4585-query decoder
self-attention and the swin windows are plain XLA SDPA-shaped einsums
(MXU-friendly, static shapes). Params are passed as jit arguments, never
closed over (see docs/PERFORMANCE.md on constant-baking).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tair_tpu.utils.maniqa import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    SwinBlock,
    _dense,
    _ln5,
)


def _ln12(name):
    # BERT keeps layer_norm_eps=1e-12 (q2l_config.json)
    return nn.LayerNorm(epsilon=1e-12, param_dtype=jnp.float32, name=name)


# --------------------------------------------------------------------------
# Swin classification backbone (BLIP/RAM variant: returns [B, 1+L, C] with
# the avg-pooled token first — ram/models/swin_transformer.py behavior)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class SwinConfig:
    img_size: int = 384
    patch_size: int = 4
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window: int = 12
    mlp_ratio: float = 4.0

    @property
    def vision_width(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def swin_l_384() -> SwinConfig:
    """swin_large_patch4_window12_384 — the `vit="swin_l"` encoder."""
    return SwinConfig()


class PatchMerging(nn.Module):
    """Torch swin downsample: 2x2 neighborhood concat -> LN -> Linear(2C)."""

    dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] -> [B, H/2, W/2, 2C]
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = _ln5("norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, param_dtype=jnp.float32,
                        name="reduction")(x)


class SwinStage(nn.Module):
    """One classification-swin stage: depth blocks + optional downsample."""

    dim: int
    res: int
    depth: int
    heads: int
    window: int
    mlp_ratio: float
    downsample: bool

    @nn.compact
    def __call__(self, x):  # [B, res, res, dim]
        b = x.shape[0]
        ws = min(self.window, self.res)
        t = x.reshape(b, self.res * self.res, self.dim)
        for j in range(self.depth):
            sh = 0 if (j % 2 == 0 or ws >= self.res) else ws // 2
            t = SwinBlock(self.dim, (self.res, self.res), self.heads, ws, sh,
                          int(self.dim * self.mlp_ratio),
                          name=f"block_{j}")(t)
        x = t.reshape(b, self.res, self.res, self.dim)
        if self.downsample:
            x = PatchMerging(self.dim, name="downsample")(x)
        return x


class SwinBackbone(nn.Module):
    """Classification Swin; reuses the window-attention blocks shared with
    MANIQA (tair_tpu/utils/maniqa.py), adding patch embed / merging / the
    BLIP-style pooled-token output."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] normalized -> [B, 1+L, C_vision]
        c = self.cfg
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size),
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = _ln5("patch_norm")(x)
        b = x.shape[0]
        res = c.grid
        dim = c.embed_dim
        for i, depth in enumerate(c.depths):
            last = i == len(c.depths) - 1
            x = SwinStage(dim, res, depth, c.num_heads[i], c.window,
                          c.mlp_ratio, downsample=not last,
                          name=f"stage_{i}")(x)
            if not last:
                res //= 2
                dim *= 2
        tokens = _ln5("norm")(x.reshape(b, res * res, dim))
        pooled = tokens.mean(axis=1, keepdims=True)  # BLIP swin: avgpool "CLS"
        return jnp.concatenate([pooled, tokens], axis=1)


# --------------------------------------------------------------------------
# Tagging decoder (BLIP med.py BertModel in 'tagging' mode; q2l_config:
# hidden 768, 4 heads, intermediate 3072, 2 layers, cross-attn width 512)
# --------------------------------------------------------------------------


def _attend(q, k, v, heads):
    b, tq, d = q.shape
    hd = d // heads
    q = q.reshape(b, tq, heads, hd)
    k = k.reshape(b, -1, heads, hd)
    v = v.reshape(b, -1, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, tq, d)


class BertTagLayer(nn.Module):
    """One post-LN BERT decoder layer: self-attn over the class queries,
    cross-attn to the image tokens, FFN. eps=1e-12 everywhere."""

    hidden: int
    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, h, enc):  # h: [B, C, hidden], enc: [B, 1+L, width]
        q = _dense(self.hidden, "self_query")(h)
        k = _dense(self.hidden, "self_key")(h)
        v = _dense(self.hidden, "self_value")(h)
        h = _ln12("self_ln")(_dense(self.hidden, "self_out")(
            _attend(q, k, v, self.heads)) + h)

        q = _dense(self.hidden, "cross_query")(h)
        k = _dense(self.hidden, "cross_key")(enc)
        v = _dense(self.hidden, "cross_value")(enc)
        h = _ln12("cross_ln")(_dense(self.hidden, "cross_out")(
            _attend(q, k, v, self.heads)) + h)

        f = nn.gelu(_dense(self.intermediate, "ffn_in")(h), approximate=False)
        return _ln12("ffn_ln")(_dense(self.hidden, "ffn_out")(f) + h)


@dataclass(frozen=True)
class RAMConfig:
    swin: SwinConfig = field(default_factory=swin_l_384)
    num_class: int = 4585
    des_per_class: int = 51       # LLM description embeddings per tag
    embed_width: int = 512        # CLIP description space (q2l encoder_width)
    hidden: int = 768             # q2l_config hidden_size
    heads: int = 4                # q2l_config num_attention_heads
    intermediate: int = 3072
    layers: int = 2
    threshold: float = 0.68       # ram_plus default class threshold


class RAMPlus(nn.Module):
    """RAM++ inference graph. Input: [B, H, W, 3] ImageNet-normalized at
    cfg.swin.img_size. Output: per-class tag logits [B, num_class]."""

    cfg: RAMConfig

    @nn.compact
    def __call__(self, image):
        c = self.cfg
        tokens = SwinBackbone(c.swin, name="visual_encoder")(image)
        embeds = _dense(c.embed_width, "image_proj")(tokens)  # [B, 1+L, 512]

        label_embed = self.param(
            "label_embed", nn.initializers.normal(0.02),
            (c.num_class * c.des_per_class, c.embed_width), jnp.float32,
        )
        reweight_scale = self.param(
            "reweight_scale", nn.initializers.constant(np.log(1.0 / 0.07)),
            (), jnp.float32,
        )

        # Description reweighting: softmax over each class's 51 frozen
        # description embeddings against the normalized pooled embedding.
        cls = embeds[:, 0]
        cls = cls / jnp.linalg.norm(cls, axis=-1, keepdims=True)
        sims = jnp.exp(reweight_scale) * (cls @ label_embed.T)
        w = jax.nn.softmax(
            sims.reshape(-1, c.num_class, c.des_per_class), axis=-1)
        per_class = label_embed.reshape(c.num_class, c.des_per_class,
                                        c.embed_width)
        queries = jnp.einsum("bcd,cde->bce", w, per_class)  # [B, C, 512]

        h = nn.relu(_dense(c.hidden, "wordvec_proj")(queries))
        for i in range(c.layers):
            h = BertTagLayer(c.hidden, c.heads, c.intermediate,
                             name=f"tag_layer_{i}")(h, embeds)

        # GroupWiseLinear: one weight row + bias per class.
        fc_w = self.param("fc_w", nn.initializers.normal(0.02),
                          (c.num_class, c.hidden), jnp.float32)
        fc_b = self.param("fc_b", nn.initializers.zeros,
                          (c.num_class,), jnp.float32)
        return (h * fc_w[None]).sum(-1) + fc_b[None]


# --------------------------------------------------------------------------
# Host-side wrapper: thresholds + tag strings (caption.py:166-171 behavior)
# --------------------------------------------------------------------------


def load_tag_list(path: str) -> Tuple[str, ...]:
    with open(path, encoding="utf-8") as f:
        return tuple(line.strip() for line in f if line.strip())


class RAMTagger:
    """Tag a batch of images; returns a list of tag-name lists per image.

    thresholds: scalar or [num_class] (ram_tag_list_threshold.txt layout).
    """

    def __init__(self, params, cfg: RAMConfig,
                 tag_list: Sequence[str] | None = None,
                 thresholds=None):
        if tag_list is not None and len(tag_list) != cfg.num_class:
            raise ValueError(
                f"tag list has {len(tag_list)} entries, model has "
                f"{cfg.num_class} classes")
        self.cfg = cfg
        self.params = params
        self.tag_list = tuple(tag_list) if tag_list is not None else tuple(
            f"tag_{i}" for i in range(cfg.num_class))
        th = cfg.threshold if thresholds is None else thresholds
        self.thresholds = np.broadcast_to(
            np.asarray(th, np.float32), (cfg.num_class,)).copy()
        self._fwd = jax.jit(functools.partial(self._logits, cfg))

    @staticmethod
    def _logits(cfg, params, image):
        return RAMPlus(cfg).apply({"params": params}, image)

    def logits(self, images: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(self.params, images)

    def __call__(self, images) -> list:
        probs = jax.nn.sigmoid(self.logits(jnp.asarray(images)))
        keep = np.asarray(probs) > self.thresholds[None]
        return [[self.tag_list[i] for i in np.flatnonzero(row)]
                for row in keep]

    @classmethod
    def from_torch(cls, path: str, cfg: RAMConfig = RAMConfig(),
                   tag_list_path: str | None = None,
                   threshold_path: str | None = None) -> "RAMTagger":
        from tair_tpu.weights.convert import convert_ram_plus, load_torch_file

        sd = load_torch_file(path)
        params = convert_ram_plus(sd, cfg)
        tags = load_tag_list(tag_list_path) if tag_list_path else None
        th = None
        if threshold_path:
            th = np.asarray(
                [float(s) for s in open(threshold_path)], np.float32)
        return cls(params, cfg, tag_list=tags, thresholds=th)


def preprocess(image: np.ndarray, size: int) -> np.ndarray:
    """[H, W, 3] float in [0,1] -> [1, size, size, 3] normalized (the ram
    get_transform: Resize((size, size)) bicubic + ImageNet normalize)."""
    import jax.image

    x = jnp.asarray(image, jnp.float32)
    x = jax.image.resize(x, (size, size, 3), method="bicubic")
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return np.asarray(x)[None]
