"""Sampler base: shared CFG-scale logic and schedule plumbing.

Counterpart of /root/reference/terediff/sampler/sampler.py:10-55.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SamplerBase:
    training_betas: np.ndarray
    parameterization: str = "v"
    rescale_cfg: bool = False

    @property
    def num_timesteps(self) -> int:
        return len(self.training_betas)

    def get_cfg_scale(self, default_cfg_scale: float, model_t) -> jnp.ndarray:
        """Cosine-rescaled CFG scale as a traced function of the timestep."""
        if self.rescale_cfg and default_cfg_scale > 1.0:
            frac = ((1000.0 - model_t.astype(jnp.float32)) / 1000.0) ** 5.0
            return 1.0 + default_cfg_scale * (1.0 - jnp.cos(jnp.pi * frac)) / 2.0
        return jnp.asarray(default_cfg_scale, dtype=jnp.float32)
