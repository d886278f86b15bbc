"""DPM-Solver++(2M) multistep sampler (lax.scan).

Counterpart of /root/reference/terediff/sampler/dpms_sampler.py:17-101 +
the vendored dpm_solver_pytorch.py (NoiseScheduleVP / DPM_Solver). The
reference vendors the full order-1..3 single/multistep library; the variant
actually useful for guided restoration is the multistep 2M solver in
log-SNR ("dpmsolver++") data-prediction form, implemented here natively as a
scan. Order-1 fallback at the first step, uniform-logSNR ("time_uniform"
lambda) spacing over the trained discrete schedule.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerBase


@dataclass(frozen=True)
class DPMSolverPP2M(SamplerBase):
    def _schedule(self, steps: int):
        ac = np.cumprod(1.0 - self.training_betas)
        log_alpha = 0.5 * np.log(ac)  # discrete log alpha_t
        t_grid = np.linspace(1e-3, 1.0, len(ac))
        # continuous interpolation of lambda(t) = log_alpha - log_sigma
        sigma = np.sqrt(1 - ac)
        lam = log_alpha - np.log(sigma)
        # uniform in t from T to eps (xp=t_grid is increasing; x pointwise)
        ts = np.linspace(1.0, 1e-3, steps + 1)
        lam_i = np.interp(ts, t_grid, lam)
        la_i = np.interp(ts, t_grid, log_alpha)
        sig_i = np.exp(la_i - lam_i)
        alpha_i = np.exp(la_i)
        # map continuous t back to nearest discrete model timestep
        t_disc = np.clip(
            np.round(ts * (len(ac) - 1)).astype(np.int32), 0, len(ac) - 1
        )
        return (
            jnp.asarray(alpha_i, jnp.float32),
            jnp.asarray(sig_i, jnp.float32),
            jnp.asarray(lam_i, jnp.float32),
            jnp.asarray(t_disc),
        )

    def sample(
        self,
        model_fn,
        steps: int,
        x_T: jnp.ndarray,
        cond,
        rng: jax.Array = None,
        uncond=None,
        cfg_scale: float = 1.0,
    ) -> jnp.ndarray:
        alpha, sigma, lam, t_disc = self._schedule(steps)
        sac = jnp.sqrt(jnp.asarray(np.cumprod(1.0 - self.training_betas), jnp.float32))
        s1m = jnp.sqrt(1.0 - sac**2)
        bs = x_T.shape[0]

        def denoise(x, i):
            """data-prediction x0 at grid node i."""
            t = jnp.full((bs,), t_disc[i], jnp.int32)
            if uncond is None:
                out, _ = model_fn(x, t, cond)
            else:
                out_c, _ = model_fn(x, t, cond)
                out_u, _ = model_fn(x, t, uncond)
                out = out_u + self.get_cfg_scale(cfg_scale, t[0]) * (out_c - out_u)
            out = out.astype(jnp.float32)
            a = sac[t_disc[i]]
            s = s1m[t_disc[i]]
            if self.parameterization == "v":
                return a * x - s * out
            return (x - s * out) / jnp.maximum(a, 1e-8)

        x0_0 = denoise(x_T, 0)

        def body(carry, i):
            x, x0_prev = carry
            # step from node i to node i+1
            h = lam[i + 1] - lam[i]
            h_prev = lam[i] - lam[i - 1]
            r = h_prev / h
            x0_cur = denoise(x, i)
            # 2M update: extrapolated data prediction
            d = jnp.where(i > 0, (1 + 1 / (2 * r)), 1.0) * x0_cur - jnp.where(
                i > 0, 1 / (2 * r), 0.0
            ) * x0_prev
            x_next = (
                sigma[i + 1] / sigma[i] * x
                - alpha[i + 1] * jnp.expm1(-h) * d
            )
            return (x_next.astype(x.dtype), x0_cur), None

        (x, _), _ = jax.lax.scan(body, (x_T, x0_0), jnp.arange(steps))
        # denoise-to-zero: return the data prediction at the final node
        return denoise(x, steps)
