"""Latent guidance (restoration guidance on pred_x0).

Capability parity with /root/reference/terediff/utils/cond_fn.py:6-111
(MSEGuidance / WeightedMSEGuidance): gradient ascent on the predicted clean
latent toward an L2 target, with a time-windowed schedule. Expressed as pure
functions on pred_x0 usable inside the sampling scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MSEGuidance:
    scale: float = 0.0
    t_start: int = 1001
    t_stop: int = -1
    n_repeats: int = 1

    def active(self, t: jnp.ndarray) -> jnp.ndarray:
        return (t < self.t_start) & (t > self.t_stop)

    def loss(self, pred_x0: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum((pred_x0 - target) ** 2)

    def __call__(self, pred_x0: jnp.ndarray, target: jnp.ndarray, t: jnp.ndarray):
        def one_step(x, _):
            g = jax.grad(lambda p: -self.loss(p, target))(x)
            return x + self.scale * g, None

        guided, _ = jax.lax.scan(one_step, pred_x0, None, length=self.n_repeats)
        gate = self.active(t).astype(pred_x0.dtype).reshape(-1, 1, 1, 1)
        return pred_x0 + gate * (guided - pred_x0)


@dataclass(frozen=True)
class WeightedMSEGuidance(MSEGuidance):
    """Edge-aware weighting: flat regions get stronger pull toward the target
    (cond_fn.py:64-111 semantics via a gradient-magnitude soft mask)."""

    def loss(self, pred_x0: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        gray = jnp.mean(target, axis=-1, keepdims=True)
        gx = jnp.abs(jnp.diff(gray, axis=2, append=gray[:, :, -1:]))
        gy = jnp.abs(jnp.diff(gray, axis=1, append=gray[:, -1:]))
        edge = jnp.clip((gx + gy) * 2.0, 0.0, 1.0)
        w = 1.0 - edge
        return jnp.sum(w * (pred_x0 - target) ** 2)
