"""DISTS perceptual metric (VGG16 backbone, Flax).

Counterpart of the reference's pyiqa DISTS usage (/root/reference/val.py:68-75
computes 8 IQA metrics per val run; DISTS is one of the full-reference four).
Faithful to the official implementation (Ding et al., "Image Quality
Assessment: Unifying Structure and Texture Similarity"):

- VGG16 conv features at 6 levels (raw input + conv1_2..conv5_3 relu),
- max-pools replaced by L2-pooling (squared -> hann-windowed depthwise conv
  stride 2 -> sqrt), as in the official DISTS VGG,
- per-channel structure (mean) and texture (var/cov) similarity, combined
  with the learned alpha/beta weights normalized by their joint sum.

The learned weights (torchvision VGG16 `features.*` + the official
`weights.pt` holding alpha/beta) are not shipped in this environment;
`DISTSMetric.from_torch` converts them when available — see
docs/METRIC_WEIGHTS.md for the exact files. Until weights are loaded,
calling the metric raises a clear error rather than returning garbage.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 feature stages: conv channel plan, torchvision `features` indices
_VGG_STAGES = [
    [(64, 0), (64, 2)],
    [(128, 5), (128, 7)],
    [(256, 10), (256, 12), (256, 14)],
    [(512, 17), (512, 19), (512, 21)],
    [(512, 24), (512, 26), (512, 28)],
]
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _l2_pool(x: jnp.ndarray, size: int = 5, stride: int = 2) -> jnp.ndarray:
    """Hann-windowed L2 pooling (official DISTS's anti-aliased downsample).

    Matches the official L2pooling exactly: `filter_size=5` means
    np.hanning(5)[1:-1] — a 3-tap [0.25, 0.5, 0.25] window — applied with
    padding (filter_size-2)//2 = 1. (An earlier cut used hanning(size+2),
    a 5-tap window: same output shape, different values — which would
    mis-calibrate converted official alpha/beta weights.)"""
    w1 = np.hanning(size)[1:-1]
    k = len(w1)
    win = np.outer(w1, w1)
    win = (win / win.sum()).astype(np.float32)
    c = x.shape[-1]
    # depthwise HWIO kernel: [k, k, 1, C] with feature_group_count=C
    kernel = jnp.broadcast_to(jnp.asarray(win)[:, :, None, None], (k, k, 1, c))
    out = jax.lax.conv_general_dilated(
        (x * x).astype(jnp.float32),
        kernel,
        window_strides=(stride, stride),
        padding=[((size - 2) // 2, (size - 2) // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.sqrt(jnp.maximum(out, 1e-12))


class VGG16Features(nn.Module):
    """VGG16 conv tower with L2-pool downsampling; returns the 6 DISTS
    feature levels (input included)."""

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for si, stage in enumerate(_VGG_STAGES):
            if si > 0:
                x = _l2_pool(x)
            for ci, (ch, _) in enumerate(stage):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=jnp.float32,
                    name=f"conv{si}_{ci}",
                )(x)
                x = nn.relu(x)
            feats.append(x)
        return feats


class DISTS(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [0, 1] -> [B] DISTS distance (0 = identical)."""
        chans = [3] + [stage[-1][0] for stage in _VGG_STAGES]
        total_ch = sum(chans)
        alpha = self.param(
            "alpha", nn.initializers.normal(0.01), (total_ch,), jnp.float32
        )
        beta = self.param(
            "beta", nn.initializers.normal(0.01), (total_ch,), jnp.float32
        )

        def norm_input(x):
            return (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)

        net = VGG16Features(name="vgg")
        fa = net(norm_input(a))
        fb = net(norm_input(b))

        w_sum = alpha.sum() + beta.sum()
        alpha_n = jnp.split(alpha / w_sum, np.cumsum(chans)[:-1])
        beta_n = jnp.split(beta / w_sum, np.cumsum(chans)[:-1])

        c1, c2 = 1e-6, 1e-6
        score = 0.0
        for xa, xb, al, be in zip(fa, fb, alpha_n, beta_n):
            mu_a = xa.mean(axis=(1, 2))
            mu_b = xb.mean(axis=(1, 2))
            var_a = ((xa - mu_a[:, None, None]) ** 2).mean(axis=(1, 2))
            var_b = ((xb - mu_b[:, None, None]) ** 2).mean(axis=(1, 2))
            cov = (
                (xa - mu_a[:, None, None]) * (xb - mu_b[:, None, None])
            ).mean(axis=(1, 2))
            s1 = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
            s2 = (2 * cov + c2) / (var_a + var_b + c2)
            score = score + (al * s1).sum(-1) + (be * s2).sum(-1)
        return 1.0 - score


class DISTSMetric:
    """Holds converted weights; callable (a, b) -> [B] distances."""

    def __init__(self, params: Optional[Dict[str, Any]] = None):
        self.model = DISTS()
        self.params = params

    @classmethod
    def from_torch(cls, vgg16_path: str, dists_weights_path: str) -> "DISTSMetric":
        """Convert torchvision vgg16 `features.*` + official DISTS weights.pt
        (keys `alpha`, `beta`, each [1, 3+64+128+256+512+512, 1, 1])."""
        import torch

        vgg = torch.load(vgg16_path, map_location="cpu", weights_only=False)
        vgg = vgg.get("state_dict", vgg) if isinstance(vgg, dict) else vgg.state_dict()
        wts = torch.load(dists_weights_path, map_location="cpu", weights_only=False)

        params: Dict[str, Any] = {"vgg": {}}
        for si, stage in enumerate(_VGG_STAGES):
            for ci, (_, idx) in enumerate(stage):
                w = np.asarray(vgg[f"features.{idx}.weight"])
                params["vgg"][f"conv{si}_{ci}"] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),
                    "bias": np.asarray(vgg[f"features.{idx}.bias"]),
                }
        params["alpha"] = np.asarray(wts["alpha"]).reshape(-1)
        params["beta"] = np.asarray(wts["beta"]).reshape(-1)
        return cls({"params": params})

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self.params is None:
            raise RuntimeError(
                "DISTS weights not loaded; use DISTSMetric.from_torch(...) "
                "with a torchvision vgg16 state dict + the official DISTS "
                "weights.pt (see docs/METRIC_WEIGHTS.md)"
            )
        return self.model.apply(self.params, a, b)

    def init_random(self, rng=None) -> "DISTSMetric":
        """Random-weight instance (tests only — NOT a calibrated metric)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((1, 64, 64, 3))
        self.params = self.model.init(rng, x, x)
        return self
