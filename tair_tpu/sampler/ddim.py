"""DDIM sampler (lax.scan).

Counterpart of /root/reference/terediff/sampler/ddim_sampler.py:61-203. Note
the reference copy is bit-rotten (it never unpacks the (eps, feats) tuple of
the modified ControlLDM and would crash if selected); this implementation
follows the pre-fork DiffBIR/DDIM semantics and handles the tuple contract.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedules import space_timesteps
from .base import SamplerBase


@dataclass(frozen=True)
class DDIMSampler(SamplerBase):
    eta: float = 0.0

    def sample(
        self,
        model_fn,
        steps: int,
        x_T: jnp.ndarray,
        cond,
        rng: jax.Array,
        uncond=None,
        cfg_scale: float = 1.0,
    ) -> jnp.ndarray:
        used = np.asarray(
            sorted(space_timesteps(self.num_timesteps, f"ddim{steps}")), np.int32
        )
        ac = np.concatenate(
            [[1.0], np.cumprod(1.0 - self.training_betas)]
        )  # alpha_bar with leading 1 for t=-1
        alphas = jnp.asarray(ac[used + 1], jnp.float32)          # [S]
        alphas_prev = jnp.asarray(
            np.concatenate([[1.0], ac[used[:-1] + 1]]), jnp.float32
        )
        sigmas = self.eta * jnp.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        timesteps = jnp.asarray(used)

        bs = x_T.shape[0]

        def body(x, i):
            idx = steps - 1 - i
            t = jnp.full((bs,), timesteps[idx], jnp.int32)
            if uncond is None:
                out, _ = model_fn(x, t, cond)
            else:
                out_c, _ = model_fn(x, t, cond)
                out_u, _ = model_fn(x, t, uncond)
                scale = self.get_cfg_scale(cfg_scale, t[0])
                out = out_u + scale * (out_c - out_u)
            out = out.astype(jnp.float32)

            a = alphas[idx]
            a_prev = alphas_prev[idx]
            sig = sigmas[idx]
            sqrt_a = jnp.sqrt(a)
            sqrt_1ma = jnp.sqrt(1 - a)
            if self.parameterization == "v":
                x0 = sqrt_a * x - sqrt_1ma * out
                eps = sqrt_a * out + sqrt_1ma * x
            else:
                eps = out
                x0 = (x - sqrt_1ma * eps) / sqrt_a

            dir_xt = jnp.sqrt(jnp.clip(1 - a_prev - sig**2, 0.0)) * eps
            noise = sig * jax.random.normal(
                jax.random.fold_in(rng, i), x.shape, jnp.float32
            )
            x_prev = jnp.sqrt(a_prev) * x0 + dir_xt + noise
            return x_prev.astype(x.dtype), None

        x, _ = jax.lax.scan(body, x_T, jnp.arange(steps))
        return x
