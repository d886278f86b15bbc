"""LPIPS perceptual metric (AlexNet backbone, Flax).

Counterpart of the reference's pyiqa LPIPS usage (/root/reference/val.py:70).
The learned weights (torchvision AlexNet features + LPIPS linear heads) are
not shipped in this environment; `load_lpips_weights` converts the standard
torch checkpoints when available. Until weights are loaded, calling the
metric raises a clear error rather than returning garbage.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# AlexNet feature stages: (out_channels, kernel, stride) with maxpools between
_ALEX_STAGES = [
    [(64, 11, 4)],
    [(192, 5, 1)],
    [(384, 3, 1)],
    [(256, 3, 1)],
    [(256, 3, 1)],
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for si, stage in enumerate(_ALEX_STAGES):
            for ci, (ch, k, s) in enumerate(stage):
                pad = k // 2 if k != 11 else 2
                x = nn.Conv(
                    ch, (k, k), strides=(s, s), padding=pad,
                    dtype=jnp.float32, name=f"conv{si}_{ci}",
                )(x)
                x = nn.relu(x)
            feats.append(x)
            if si < 2:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [0, 1] -> [B] perceptual distance."""
        def norm_input(x):
            x = x * 2.0 - 1.0
            return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)

        net = AlexNetFeatures(name="alex")
        fa = net(norm_input(a))
        fb = net(norm_input(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa / jnp.maximum(
                jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10
            )
            xb = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10
            )
            diff = (xa - xb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                        name=f"lin{i}")(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


class LPIPSMetric:
    """Holds converted weights; callable (a, b) -> [B] distances."""

    def __init__(self, params: Optional[Dict[str, Any]] = None):
        self.model = LPIPS()
        self.params = params

    @classmethod
    def from_torch(cls, alexnet_path: str, lpips_path: str) -> "LPIPSMetric":
        """Convert torchvision alexnet `features` + lpips `lin*` weights."""
        import torch

        alex = torch.load(alexnet_path, map_location="cpu", weights_only=False)
        lin = torch.load(lpips_path, map_location="cpu", weights_only=False)
        alex = alex.get("state_dict", alex)
        params: Dict[str, Any] = {"alex": {}}
        # torchvision alexnet features conv indices: 0, 3, 6, 8, 10
        for dst, idx in zip(
            ["conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0"],
            [0, 3, 6, 8, 10],
        ):
            w = np.asarray(alex[f"features.{idx}.weight"])
            params["alex"][dst] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": np.asarray(alex[f"features.{idx}.bias"]),
            }
        for i in range(5):
            w = np.asarray(lin[f"lin{i}.model.1.weight"])
            params[f"lin{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        return cls({"params": params})

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self.params is None:
            raise RuntimeError(
                "LPIPS weights not loaded; use LPIPSMetric.from_torch(...) "
                "with torchvision alexnet + lpips lin checkpoints"
            )
        return self.model.apply(self.params, a, b)

    def init_random(self, rng=None) -> "LPIPSMetric":
        """Random-weight instance (tests only — NOT a calibrated metric)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        x = jnp.zeros((1, 64, 64, 3))
        self.params = self.model.init(rng, x, x)
        return self
