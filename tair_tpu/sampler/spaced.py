"""Spaced DDPM ancestral sampler (the sampler TAIR uses), as a lax.scan.

Behavioral parity with /root/reference/terediff/sampler/spaced_sampler.py:
  - make_schedule / q_posterior / p_sample  (:79-189)
  - sample() with UNet-feature capture at tagged iterations (:192-243)
  - val_sample() per-step spotter -> prompt recycling (:246-328), which here
    is a host-driven loop over a jitted step (tokenization is inherently
    data-dependent; everything else stays on device).

TPU design: the whole 50-step loop is ONE compiled `lax.scan` over stacked
schedule buffers; per-step noise comes from `jax.random.fold_in`; tagged
feature capture uses masked buffer writes (static tag list) instead of
Python-side accumulation, so memory stays at n_tags x feature pyramid.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedules import SpacedSchedule
from .base import SamplerBase

ModelFn = Callable  # (x, model_t, cond) -> (model_output, feats_tuple)


def _bcast(coef: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return coef.reshape((-1,) + (1,) * (like.ndim - 1)).astype(like.dtype)


@dataclass(frozen=True)
class SpacedSampler(SamplerBase):
    def make_schedule(self, num_steps: int) -> SpacedSchedule:
        return SpacedSchedule.create(self.training_betas, num_steps)

    # ---- single step ----------------------------------------------------

    def predict_x0(self, sp, x, t_idx, model_output):
        sac = jnp.asarray(sp.sqrt_alphas_cumprod, jnp.float32)[t_idx]
        s1m = jnp.asarray(sp.sqrt_one_minus_alphas_cumprod, jnp.float32)[t_idx]
        if self.parameterization == "v":
            return _bcast(sac, x) * x - _bcast(s1m, x) * model_output
        sra = jnp.asarray(sp.sqrt_recip_alphas_cumprod, jnp.float32)[t_idx]
        srm = jnp.asarray(sp.sqrt_recipm1_alphas_cumprod, jnp.float32)[t_idx]
        return _bcast(sra, x) * x - _bcast(srm, x) * model_output

    def q_posterior(self, sp, x0, x_t, t_idx):
        c1 = jnp.asarray(sp.posterior_mean_coef1, jnp.float32)[t_idx]
        c2 = jnp.asarray(sp.posterior_mean_coef2, jnp.float32)[t_idx]
        var = jnp.asarray(sp.posterior_variance, jnp.float32)[t_idx]
        mean = _bcast(c1, x0) * x0 + _bcast(c2, x_t) * x_t
        return mean, _bcast(var, x_t)

    def apply_model(
        self,
        model_fn: ModelFn,
        x,
        model_t,
        cond,
        uncond,
        cfg_scale,
    ):
        # cfg_scale is a static Python float: at 1.0 the combined output
        # reduces to the conditional branch exactly (cosine rescale only
        # activates for scale > 1), so skip the second UNet+ControlNet
        # forward (reference spaced_sampler.py:158 guard)
        if uncond is None or (
            isinstance(cfg_scale, (int, float)) and float(cfg_scale) == 1.0
        ):
            return model_fn(x, model_t, cond)
        out_c, feats = model_fn(x, model_t, cond)
        out_u, _ = model_fn(x, model_t, uncond)
        scale = self.get_cfg_scale(cfg_scale, model_t[0])
        return out_u + scale * (out_c - out_u), feats

    def p_sample(
        self,
        model_fn: ModelFn,
        sp: SpacedSchedule,
        x: jnp.ndarray,
        step_idx: jnp.ndarray,  # scalar int: index into the spaced schedule
        cond,
        uncond,
        cfg_scale: float,
        rng: jax.Array,
    ):
        """One ancestral step x_i -> x_{i-1}; returns (x_prev, feats)."""
        bs = x.shape[0]
        model_t = jnp.full((bs,), jnp.asarray(sp.timesteps)[step_idx], jnp.int32)
        t_idx = jnp.full((bs,), step_idx, jnp.int32)
        model_output, feats = self.apply_model(
            model_fn, x, model_t, cond, uncond, cfg_scale
        )
        x0 = self.predict_x0(sp, x, t_idx, model_output.astype(jnp.float32))
        mean, var = self.q_posterior(sp, x0, x, t_idx)
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        nonzero = jnp.asarray(step_idx != 0, jnp.float32)
        x_prev = mean + nonzero * jnp.sqrt(var) * noise
        return x_prev.astype(x.dtype), feats

    # ---- full compiled loop ----------------------------------------------

    def sample(
        self,
        model_fn: ModelFn,
        steps: int,
        x_T: jnp.ndarray,
        cond,
        rng: jax.Array,
        uncond=None,
        cfg_scale: float = 1.0,
        feat_iterations: Sequence[int] = (),
    ):
        """Run the full spaced-DDPM chain as one lax.scan.

        feat_iterations: 1-based iteration numbers (matching the reference's
        `unet_feat_sampling_timestep` config, e.g. [10,20,30,40,50]) at which
        the UNet decoder features are captured. Returns
        (x_0, feats_pytree) where feats_pytree is a tuple (one per feature
        level) of arrays [n_tags, B, H, W, C] ordered by tag.
        """
        sp = self.make_schedule(steps)
        total = sp.num_steps
        tags = np.asarray(sorted(feat_iterations), dtype=np.int32)
        if len(tags) and int(tags[-1]) > total:
            # a tag past the chain length would never fire and its fixed
            # buffer slot would silently stay zeros — the spotter would then
            # run on blank "features" (the reference appends only fired
            # tags, spaced_sampler.py:240-242, so its consumers see fewer)
            raise ValueError(
                f"feat_iterations {sorted(feat_iterations)} exceed the "
                f"{total}-step chain; tags are 1-based iteration numbers"
            )

        # Probe feature shapes abstractly (no FLOPs) to allocate tag buffers.
        if len(tags) > 0:
            _, feats_shape = jax.eval_shape(
                lambda x: model_fn(
                    x, jnp.zeros((x.shape[0],), jnp.int32), cond
                ),
                x_T,
            )
            feat_bufs = tuple(
                jnp.zeros((len(tags),) + tuple(f.shape), jnp.float32)
                for f in feats_shape
            )
        else:
            feat_bufs = ()

        tags_j = jnp.asarray(tags) if len(tags) else None

        def body(carry, i):
            x, bufs = carry
            # iteration i walks timesteps descending: step_idx = total-1-i
            step_idx = total - 1 - i
            step_rng = jax.random.fold_in(rng, i)
            x_prev, feats = self.p_sample(
                model_fn, sp, x, step_idx, cond, uncond, cfg_scale, step_rng
            )
            if tags_j is not None:
                # tag slot j fires when iteration (i+1) == tags[j]
                hit = (tags_j == (i + 1))  # [n_tags] bool
                bufs = tuple(
                    jnp.where(
                        hit[:, None, None, None, None],
                        jnp.broadcast_to(f[None].astype(jnp.float32), b.shape),
                        b,
                    )
                    for b, f in zip(bufs, feats)
                )
            return (x_prev, bufs), None

        (x, feat_bufs), _ = jax.lax.scan(
            body, (x_T, feat_bufs), jnp.arange(total)
        )
        return x, feat_bufs

    # ---- host-driven loop with per-step feedback ---------------------------

    def val_sample_loop(
        self,
        step_fn: Callable,  # jitted: (x, step_idx, cond, rng) -> (x_prev, feats)
        steps: int,
        x_T: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
        feedback_fn: Optional[Callable] = None,
        # feedback_fn(feats, cond, iteration) -> (cond, info); host-side hook
        # that may run the spotter and rewrite cond['c_txt'].
    ):
        """Reference val_sample semantics: per-step OCR -> prompt recycling.

        The diffusion step is a single pre-jitted function; only the feedback
        hook (tokenization + spotter postprocess) runs host-side per step.
        """
        sp = self.make_schedule(steps)
        total = sp.num_steps
        x = x_T
        infos = []
        for i in range(total):
            step_rng = jax.random.fold_in(rng, i)
            x, feats = step_fn(x, total - 1 - i, cond, step_rng)
            if feedback_fn is not None:
                cond, info = feedback_fn(feats, cond, i)
                infos.append(info)
        return x, infos
