"""EDM / Karras-style samplers (Euler, Heun, DPM++2M, ancestral and SDE
variants) as lax.scans.

Counterpart of /root/reference/terediff/sampler/edm_sampler.py:26-188 + the
vendored k_diffusion.py:123-707 (sample_euler / sample_heun /
sample_dpmpp_2m and the _ancestral/_sde variants over a VP-wrapped
denoiser). The trained model is discrete VP; it is wrapped as a Karras
denoiser D(x, sigma) via the standard VP preconditioning (x scaled by
1/sqrt(1+sigma^2), timestep looked up from the trained sigma table).

Stochastic solvers draw per-step noise from the caller's PRNG key with
`jax.random.fold_in(rng, step)` — the counted-key equivalent of
k-diffusion's BrownianTreeNoiseSampler (k_diffusion.py:70-105): same
distribution, deterministic given the seed, and independent of step count
partitioning only in the tree sampler, which matters for reproducing
trajectories across step counts, not for sample quality.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .base import SamplerBase


def karras_sigmas(n: int, sigma_min: float, sigma_max: float, rho: float = 7.0):
    ramp = np.linspace(0, 1, n)
    min_inv = sigma_min ** (1 / rho)
    max_inv = sigma_max ** (1 / rho)
    sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
    return np.append(sigmas, 0.0).astype(np.float32)


@dataclass(frozen=True)
class EDMSampler(SamplerBase):
    # euler | heun | dpmpp_2m | euler_ancestral | dpmpp_2m_sde
    solver: str = "dpmpp_2m"
    eta: float = 1.0  # ancestral/SDE noise scale

    def _vp_tables(self):
        ac = np.cumprod(1.0 - self.training_betas)
        # clamp for zero-terminal-SNR schedules (alpha_bar(T) = 0 -> inf)
        sigmas_vp = np.sqrt((1 - ac) / np.clip(ac, 1e-10, 1.0))
        return jnp.asarray(sigmas_vp, jnp.float32)

    def _denoiser(self, model_fn, cond, uncond, cfg_scale, sigmas_vp):
        sac = jnp.sqrt(
            jnp.asarray(np.cumprod(1.0 - self.training_betas), jnp.float32)
        )
        s1m = jnp.sqrt(1.0 - sac**2)

        def D(x, sigma):
            """x in Karras space -> denoised x0."""
            # nearest trained timestep for this sigma
            t_idx = jnp.argmin(jnp.abs(sigmas_vp[None, :] - sigma), axis=-1)
            t_idx = jnp.broadcast_to(t_idx, (x.shape[0],))
            x_vp = x / jnp.sqrt(1.0 + sigma**2)  # to VP scaling
            if uncond is None:
                out, _ = model_fn(x_vp, t_idx, cond)
            else:
                out_c, _ = model_fn(x_vp, t_idx, cond)
                out_u, _ = model_fn(x_vp, t_idx, uncond)
                out = out_u + self.get_cfg_scale(cfg_scale, t_idx[0]) * (
                    out_c - out_u
                )
            out = out.astype(jnp.float32)
            a = sac[t_idx[0]]
            s = s1m[t_idx[0]]
            if self.parameterization == "v":
                return a * x_vp - s * out
            return (x_vp - s * out) / jnp.maximum(a, 1e-8)

        return D

    def sample(
        self,
        model_fn,
        steps: int,
        x_T: jnp.ndarray,
        cond,
        rng: jax.Array = None,
        uncond=None,
        cfg_scale: float = 1.0,
        sigma_min: float = 0.0292,
        sigma_max: float = 14.61,
    ) -> jnp.ndarray:
        sigmas_vp = self._vp_tables()
        sig = jnp.asarray(karras_sigmas(steps, sigma_min, sigma_max))
        D = self._denoiser(model_fn, cond, uncond, cfg_scale, sigmas_vp)
        x = x_T.astype(jnp.float32) * sig[0]

        if self.solver == "euler":
            def body(x, i):
                d = (x - D(x, sig[i])) / sig[i]
                return x + d * (sig[i + 1] - sig[i]), None

            x, _ = jax.lax.scan(body, x, jnp.arange(steps))

        elif self.solver == "heun":
            def body(x, i):
                d = (x - D(x, sig[i])) / sig[i]
                dt = sig[i + 1] - sig[i]
                x_e = x + d * dt

                def heun(_):
                    d2 = (x_e - D(x_e, sig[i + 1])) / sig[i + 1]
                    return x + (d + d2) / 2 * dt

                return jax.lax.cond(sig[i + 1] > 0, heun, lambda _: x_e, None), None

            x, _ = jax.lax.scan(body, x, jnp.arange(steps))

        elif self.solver == "dpmpp_2m":
            lam = jnp.log(jnp.maximum(sig, 1e-10))

            def body(carry, i):
                x, x0_prev = carry
                x0 = D(x, sig[i])
                h = lam[i + 1] - lam[i]
                h_prev = lam[i] - lam[i - 1]
                r = h_prev / h
                d = jnp.where(i > 0, 1 + 1 / (2 * r), 1.0) * x0 - jnp.where(
                    i > 0, 1 / (2 * r), 0.0
                ) * x0_prev
                x_std = sig[i + 1] / sig[i] * x - jnp.expm1(-h) * d
                # final step (sigma -> 0): return the denoised image
                x_next = jnp.where(sig[i + 1] > 0, x_std, x0)
                return (x_next, x0), None

            (x, _), _ = jax.lax.scan(body, (x, D(x, sig[0]) * 0), jnp.arange(steps))

        elif self.solver == "euler_ancestral":
            if rng is None:
                rng = jax.random.PRNGKey(0)

            def body(x, i):
                x0 = D(x, sig[i])
                # get_ancestral_step (k_diffusion.py:60-67)
                s2, sn2 = sig[i] ** 2, sig[i + 1] ** 2
                sigma_up = jnp.minimum(
                    sig[i + 1], self.eta * jnp.sqrt(sn2 * (s2 - sn2) / s2)
                )
                sigma_up = jnp.where(sig[i + 1] > 0, sigma_up, 0.0)
                sigma_down = jnp.sqrt(jnp.maximum(sn2 - sigma_up**2, 0.0))
                d = (x - x0) / sig[i]
                x_next = x + d * (sigma_down - sig[i])
                noise = jax.random.normal(
                    jax.random.fold_in(rng, i), x.shape, jnp.float32
                )
                x_next = x_next + noise * sigma_up
                return jnp.where(sig[i + 1] > 0, x_next, x0), None

            x, _ = jax.lax.scan(body, x, jnp.arange(steps))

        elif self.solver == "dpmpp_2m_sde":
            if rng is None:
                rng = jax.random.PRNGKey(0)
            # k-diffusion's t = -log(sigma); h = t_next - t ("midpoint" form)
            lam = -jnp.log(jnp.maximum(sig, 1e-10))

            def body(carry, i):
                x, x0_prev = carry
                x0 = D(x, sig[i])
                h = lam[i + 1] - lam[i]
                h0 = lam[i] - lam[i - 1]
                eta_h = self.eta * h
                decay = sig[i + 1] / sig[i] * jnp.exp(-eta_h)
                mix = -jnp.expm1(-h - eta_h)
                x_next = decay * x + mix * x0
                # midpoint correction from the previous data prediction
                r = h0 / h
                x_next = x_next + jnp.where(
                    i > 0, 0.5 * mix / r, 0.0
                ) * (x0 - x0_prev)
                noise = jax.random.normal(
                    jax.random.fold_in(rng, i), x.shape, jnp.float32
                )
                x_next = x_next + noise * sig[i + 1] * jnp.sqrt(
                    jnp.maximum(-jnp.expm1(-2.0 * eta_h), 0.0)
                )
                return (jnp.where(sig[i + 1] > 0, x_next, x0), x0), None

            (x, _), _ = jax.lax.scan(body, (x, x * 0), jnp.arange(steps))
        else:
            raise ValueError(self.solver)

        return x
