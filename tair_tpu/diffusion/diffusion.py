"""Diffusion forward process + training loss (jittable).

Semantics match /root/reference/terediff/model/gaussian_diffusion.py:125-203
(q_sample, v-target, p_losses) but are expressed as pure functions over a
`DiffusionSchedule` whose buffers are closed over as jnp constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather a[t] and reshape to [b, 1, 1, ...] for broadcasting over ndim."""
    out = a[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


@dataclass(frozen=True)
class Diffusion:
    """Training-time diffusion math under eps/x0/v parameterization."""

    schedule: DiffusionSchedule
    parameterization: str = "v"
    loss_type: str = "l2"

    def __post_init__(self):
        assert self.parameterization in ("eps", "x0", "v")
        assert self.loss_type in ("l1", "l2")

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    def _buf(self, name: str) -> jnp.ndarray:
        return jnp.asarray(getattr(self.schedule, name), dtype=jnp.float32)

    def q_sample(self, z_0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        return (
            _extract(self._buf("sqrt_alphas_cumprod"), t, z_0.ndim) * z_0
            + _extract(self._buf("sqrt_one_minus_alphas_cumprod"), t, z_0.ndim) * noise
        )

    def get_v(self, x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return (
            _extract(self._buf("sqrt_alphas_cumprod"), t, x.ndim) * noise
            - _extract(self._buf("sqrt_one_minus_alphas_cumprod"), t, x.ndim) * x
        )

    def pred_x_start_from_eps(self, x_t, t, eps):
        return (
            x_t - _extract(self._buf("sqrt_one_minus_alphas_cumprod"), t, x_t.ndim) * eps
        ) / _extract(self._buf("sqrt_alphas_cumprod"), t, x_t.ndim)

    def pred_x_start_from_v(self, x_t, t, v):
        return (
            _extract(self._buf("sqrt_alphas_cumprod"), t, x_t.ndim) * x_t
            - _extract(self._buf("sqrt_one_minus_alphas_cumprod"), t, x_t.ndim) * v
        )

    def target(self, z_0, noise, t):
        if self.parameterization == "x0":
            return z_0
        if self.parameterization == "eps":
            return noise
        return self.get_v(z_0, noise, t)

    def loss(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        diff = target.astype(jnp.float32) - pred.astype(jnp.float32)
        if self.loss_type == "l1":
            return jnp.mean(jnp.abs(diff))
        return jnp.mean(diff * diff)

    def p_losses(
        self,
        model_fn: Callable,  # (z_t, t, cond) -> (model_output, extracted_feats)
        z_0: jnp.ndarray,
        t: jnp.ndarray,
        cond,
        rng: jax.Array,
    ):
        """Single-step training loss; returns (loss, extracted_feats)."""
        noise = jax.random.normal(rng, z_0.shape, dtype=z_0.dtype)
        z_t = self.q_sample(z_0, t, noise)
        model_output, extracted_feats = model_fn(z_t, t, cond)
        return self.loss(model_output, self.target(z_0, noise, t)), extracted_feats
