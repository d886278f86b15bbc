"""DiffBIR-style general restoration pipeline (cleaner -> cldm -> color fix).

Capability parity with /root/reference/terediff/pipeline.py:45-421 (the
Pipeline/BSRNetPipeline/SwinIRPipeline/SCUNetPipeline family — dead code on
the TAIR path but the documented general-restoration API): pluggable stage-1
cleaner, padding to the diffusion stride, optional tiled VAE + tiled
sampling, optional latent MSE guidance, wavelet color fix against the
cleaner output.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .pipeline import TeReDiff
from .utils.guidance import MSEGuidance
from .utils.metrics import wavelet_reconstruction

Params = Any


@dataclass(frozen=True)
class DiffBIRPipeline:
    model: TeReDiff
    cleaner_apply: Optional[Callable] = None  # (params, lq [0,1]) -> [0,1]

    def _clean(self, params: Params, lq: jnp.ndarray) -> jnp.ndarray:
        if self.cleaner_apply is not None:
            return jnp.clip(self.cleaner_apply(params, lq), 0.0, 1.0)
        return self.model.clean(params, lq)

    def run(
        self,
        params: Params,
        lq: jnp.ndarray,                  # [B, H, W, 3] in [0,1]
        prompt_tokens: jnp.ndarray,       # [B, 77]
        rng: jax.Array,
        steps: int = 50,
        cfg_scale: float = 1.0,
        guidance: Optional[MSEGuidance] = None,
        color_fix: bool = True,
        tiled: bool = False,
        tile_size: int = 512,
        tile_stride: int = 256,
    ) -> jnp.ndarray:
        """Full restoration; pads H/W to a multiple of 64 (the diffusion
        stride) with reflect padding and crops back (pipeline.py padding
        rules), then wavelet-color-fixes against the cleaner output.

        tiled=True runs DiffBIR's tiled mode at inputs larger than
        tile_size: gaussian-blended tiled LATENT sampling (make_tiled_fn
        semantics, pipeline.py:202-225 + ddim_sampler.py:165-180) and the
        seam-free tiled VAE for encode/decode."""
        b, h, w, _ = lq.shape
        ph, pw = (-h) % 64, (-w) % 64
        x = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        clean = self._clean(params, x)
        use_tiles = tiled and (x.shape[1] > tile_size or x.shape[2] > tile_size)
        if use_tiles:
            from .utils.tilevae import tiled_vae_decode, tiled_vae_encode

            c_img = tiled_vae_encode(
                self.model.cldm, params, clean * 2.0 - 1.0,
                tile_size=tile_size, overlap=tile_size - tile_stride,
            )
        else:
            c_img = self.model.cldm.vae_encode(
                params, clean * 2.0 - 1.0, sample=False
            )
        cond = dict(
            c_txt=self.model.cldm.clip_encode_tokens(params, prompt_tokens),
            c_img=c_img,
        )
        uncond = None
        if cfg_scale != 1.0:
            # classifier-free guidance: empty-prompt negative branch, same
            # image condition (reference pipeline.py builds uncond the same
            # way; without this the cfg_scale argument would be inert)
            from .models.tokenizer import get_tokenizer

            tok = get_tokenizer()
            empty = (
                jnp.zeros((b, 77), jnp.int32)
                .at[:, 0].set(tok.sot_token)
                .at[:, 1].set(tok.eot_token)
            )
            uncond = dict(
                c_txt=self.model.cldm.clip_encode_tokens(params, empty),
                c_img=c_img,
            )
        hh, ww = x.shape[1] // 8, x.shape[2] // 8
        k_noise, k_chain = jax.random.split(rng)
        x_T = jax.random.normal(k_noise, (b, hh, ww, 4), jnp.float32)

        if use_tiles:
            # tiled latent diffusion: each model evaluation runs per latent
            # tile (with the matching c_img tile) and blends with gaussian
            # weights — the reference's make_tiled_fn applied to the cldm
            from .tiling import make_tiled_fn

            def _apply_tile(z_tile, ci_tile, t, c_txt):
                n = z_tile.shape[0]
                reps = n // b
                ctx = jnp.tile(c_txt, (reps, 1, 1))
                eps, _ = self.model.cldm.apply(
                    params, z_tile, jnp.tile(t, (reps,)),
                    dict(c_txt=ctx, c_img=ci_tile),
                )
                return eps

            lt, ls = tile_size // 8, tile_stride // 8

            def model_fn(z, t, cond_in):
                # thread the CALLER's text embedding so CFG's uncond branch
                # (empty-prompt c_txt) isn't silently replaced by the cond one
                tiled_eps = make_tiled_fn(
                    lambda zt, ci: _apply_tile(zt, ci, t, cond_in["c_txt"]),
                    lt, ls,
                )
                return tiled_eps(z, cond_in["c_img"]), ()
        else:
            model_fn = partial(self.model.cldm.apply, params)
        sampler = self.model.sampler()
        z0, _ = sampler.sample(
            model_fn, steps=steps, x_T=x_T, cond=cond, rng=k_chain,
            uncond=uncond, cfg_scale=cfg_scale,
        )
        if guidance is not None:
            # apply guidance as a post-hoc latent pull toward the condition
            z0 = guidance(z0, cond["c_img"], jnp.zeros((b,), jnp.int32))
        if use_tiles:
            restored = tiled_vae_decode(
                self.model.cldm, params, z0,
                tile_size=tile_size // 8,
                overlap=(tile_size - tile_stride) // 8,
            )
        else:
            restored = self.model.cldm.vae_decode(params, z0)
        restored = jnp.clip((restored + 1.0) / 2.0, 0.0, 1.0)
        if color_fix:
            restored = jnp.clip(wavelet_reconstruction(restored, clean), 0.0, 1.0)
        return restored[:, :h, :w]
