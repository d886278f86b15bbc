"""DPM-Solver++ multistep samplers, orders 1-3 (lax.scan).

Counterpart of /root/reference/terediff/sampler/dpms_sampler.py:17-101 +
the vendored dpm_solver_pytorch.py (NoiseScheduleVP / DPM_Solver orders
1-3 single/multistep). Implemented natively as one scan in log-SNR
("dpmsolver++") data-prediction form with the standard multistep warmup
(order reduction at the first nodes), "time_uniform" lambda spacing over
the trained discrete schedule. Order 1 is the DDIM-equivalent update;
order 2 is the usual "2M" solver; order 3 adds the second divided
difference (multistep_dpm_solver_third_update in the vendored library).
Singlestep solvers are intentionally not rebuilt: at guided-restoration
step counts the multistep family dominates them (and the reference's
sampler entry point defaults to multistep, dpms_sampler.py:66).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerBase


@dataclass(frozen=True)
class DPMSolverPP(SamplerBase):
    order: int = 2

    def _schedule(self, steps: int):
        ac = np.cumprod(1.0 - self.training_betas)
        # zero-terminal-SNR schedules (the TAIR production schedule) end at
        # alpha_bar = 0 exactly; clamp before the logs or lambda(T) = -inf
        # poisons the first solver step with NaNs
        ac = np.clip(ac, 1e-10, 1.0)
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

        if self.order not in (1, 2, 3):
            raise ValueError(f"order must be 1, 2 or 3, got {self.order}")
        x0_0 = denoise(x_T, 0)

        def body(carry, i):
            x, x0_prev, x0_prev2 = carry
            # step from node i to node i+1
            h = lam[i + 1] - lam[i]
            h0 = lam[i] - lam[i - 1]
            h1 = lam[i - 1] - lam[i - 2]
            r0 = h0 / h
            r1 = h1 / h
            x0_cur = denoise(x, i)

            phi1 = jnp.expm1(-h)
            base = sigma[i + 1] / sigma[i] * x - alpha[i + 1] * phi1 * x0_cur

            # divided differences of the data predictions (0 at warmup nodes)
            d1_0 = jnp.where(i > 0, (x0_cur - x0_prev) / r0, 0.0)
            d1_1 = jnp.where(i > 1, (x0_prev - x0_prev2) / r1, 0.0)

            if self.order == 1:
                x_next = base
            elif self.order == 2:
                # 2M update: extrapolated data prediction, order-1 at i==0
                x_next = base - alpha[i + 1] * phi1 * jnp.where(
                    i > 0, 0.5 * d1_0, 0.0
                )
            else:
                # 3M (multistep_dpm_solver_third_update, dpmsolver++ form);
                # order-reduced warmup: 1 at i==0, 2 at i==1
                d1 = d1_0 + jnp.where(i > 1, r0 / (r0 + r1), 0.0) * (d1_0 - d1_1)
                d2 = jnp.where(i > 1, (d1_0 - d1_1) / (r0 + r1), 0.0)
                phi2 = phi1 / h + 1.0
                phi3 = phi2 / h - 0.5
                x_next = jnp.where(
                    i == 1,
                    base - alpha[i + 1] * phi1 * 0.5 * d1_0,
                    base
                    + alpha[i + 1] * phi2 * d1
                    - alpha[i + 1] * phi3 * d2,
                )

            return (x_next.astype(x.dtype), x0_cur, x0_prev), None

        (x, _, _), _ = jax.lax.scan(body, (x_T, x0_0, x0_0), jnp.arange(steps))
        # denoise-to-zero: return the data prediction at the final node
        return denoise(x, steps)


# the variant TAIR-adjacent pipelines reach for by default
DPMSolverPP2M = partial(DPMSolverPP, order=2)
