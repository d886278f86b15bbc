"""OpenCLIP text tower (Flax), penultimate-layer embeddings.

Capability parity with FrozenOpenCLIPEmbedder + the vendored open_clip text
transformer (/root/reference/terediff/model/clip.py:8-61,
/root/reference/terediff/model/open_clip/transformer.py:199-735): token +
positional embedding, pre-LN causal transformer, run through layers-1 blocks
("penultimate"), then ln_final. Output: [B, 77, width] conditioning for the
UNet cross-attention. TPU notes: batch-first layout (no torch LND permute),
causal masking folded into the SDPA call, fp32 LayerNorm islands.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import dense
from .tokenizer import CONTEXT_LENGTH, tokenize

Dtype = Any


@dataclass(frozen=True)
class CLIPTextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    mlp_ratio: int = 4
    # "penultimate" runs layers-1 blocks; "last" runs all of them.
    layer: str = "penultimate"
    # OpenCLIP (the SD-2.1 tower) uses exact GELU; ORIGINAL OpenAI CLIP
    # checkpoints (RN50 etc., the CLIP-IQA backbone) were trained with
    # QuickGELU: x * sigmoid(1.702 x).
    act: str = "gelu"


def _act(name: str, x):
    if name == "quick_gelu":
        return x * nn.sigmoid(1.702 * x)
    return nn.gelu(x, approximate=False)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: int
    dtype: Dtype = jnp.float32
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attn",
        )(h.astype(self.dtype), h.astype(self.dtype), mask=mask)
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_2")(x)
        h = dense(self.width * self.mlp_ratio, self.dtype, name="mlp_fc")(
            h.astype(self.dtype)
        )
        h = _act(self.act, h)
        h = dense(self.width, self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextTower(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [B, 77] int32 -> [B, 77, width] penultimate embeddings."""
        cfg = self.cfg
        tok_emb = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=self.dtype, param_dtype=jnp.float32,
            name="token_embedding",
        )(tokens)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (cfg.context_length, cfg.width),
            jnp.float32,
        )
        x = tok_emb + pos_emb.astype(tok_emb.dtype)

        causal = nn.make_causal_mask(tokens)  # [B, 1, T, T] bool
        n_blocks = cfg.layers - (1 if cfg.layer == "penultimate" else 0)
        for i in range(n_blocks):
            x = ResidualAttentionBlock(
                cfg.width, cfg.heads, cfg.mlp_ratio, self.dtype, act=cfg.act,
                name=f"block_{i}",
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_final")(x)
        return x


class TextEncoder:
    """Host tokenization + on-device tower: encode(list[str]) -> [B,77,width]."""

    def __init__(self, tower: CLIPTextTower, params):
        self.tower = tower
        self.params = params

    def encode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.tower.apply(self.params, tokens)

    def encode(self, texts: Union[str, List[str]]) -> jnp.ndarray:
        tokens = jnp.asarray(tokenize(texts, CONTEXT_LENGTH))
        return self.encode_tokens(tokens)
